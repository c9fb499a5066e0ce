from pygcn_tpu.utils.config import Config


def test_defaults_and_attr_access():
    c = Config(NN=70)
    assert c.gcn_nfeat == 8 and c.linear_nhid1 == 64
    assert c.NN == 70


def test_path_keys_and_state_dict():
    inner = Config()
    c = Config(sub=inner)
    c["sub/gcn_nhid"] = 99
    assert c["sub/gcn_nhid"] == 99
    flat = c.state_dict
    assert flat["sub/gcn_nhid"] == 99
    assert "gcn_nfeat" in flat


def test_merge_copy_haslist_tostring():
    a = Config()
    b = Config(extra=[1, 2])
    a.merge(b)
    assert a.extra == [1, 2]
    assert a.has_list()
    cp = a.copy()
    cp.extra.append(3)
    assert a.extra == [1, 2]  # deep copy of lists
    s = a.to_string()
    assert "gcn_nfeat: 8" in s
