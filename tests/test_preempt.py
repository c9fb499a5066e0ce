"""Preemption-safe training: PreemptionGuard + evaluator save/resume wiring."""

import os
import signal

import pytest

pytestmark = pytest.mark.apps


def test_guard_latches_signal_and_restores_handler():
    from pygcn_tpu.train.preempt import PreemptionGuard

    sentinel = lambda signum, frame: None
    prev = signal.signal(signal.SIGTERM, sentinel)
    try:
        with PreemptionGuard() as guard:
            assert not guard.requested
            os.kill(os.getpid(), signal.SIGTERM)
            assert guard.requested  # latched, not killed
        # handler restored on exit
        assert signal.getsignal(signal.SIGTERM) is sentinel
    finally:
        signal.signal(signal.SIGTERM, prev)


def test_guard_is_inert_off_main_thread():
    import threading

    from pygcn_tpu.train.preempt import PreemptionGuard

    out = {}

    def worker():
        with PreemptionGuard() as guard:
            out["requested"] = guard.requested

    t = threading.Thread(target=worker)
    t.start()
    t.join()
    assert out == {"requested": False}


@pytest.fixture(scope="module")
def gt_csv(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("gt_pre") / "vac.csv")
    from pygcn_tpu.apps import gt_gen

    gt_gen.main([
        "--out", path, "--num_samples", "12", "--batch", "6",
        "--num_seeds", "2", "--hours", "48", "--n_cbgs", "32", "--NN", "4",
    ])
    return path


def test_evaluator_preemption_saves_and_resumes(gt_csv, tmp_path, monkeypatch):
    from pygcn_tpu.apps import train_evaluator

    class InstantPreemption:
        """Guard stub whose flag is already set: preempts after epoch 0."""

        requested = True

        def __enter__(self):
            return self

        def __exit__(self, *exc):
            return None

    out_dir = str(tmp_path / "eval_pre")
    common = [
        "--vac_result_path", gt_csv, "--out_dir", out_dir,
        "--n_cbgs", "32", "--hours", "48", "--batch_size", "4",
    ]

    monkeypatch.setattr(train_evaluator, "PreemptionGuard", InstantPreemption)
    result = train_evaluator.main(common + ["--epochs", "5"])
    assert result is None  # preempted: no test metrics, clean exit
    ckpt_last = os.path.join(out_dir, "checkpoint_last.pkl")
    assert os.path.exists(ckpt_last)

    from pygcn_tpu.train import load_checkpoint

    payload = load_checkpoint(ckpt_last)
    assert payload["epoch"] == 1  # resumes AFTER the completed epoch 0
    # explicit extra slot (ADVICE r1): watermarks + early-stop state, no
    # key-sniffing of scheduler_state
    assert {"min_val_loss", "max_val_corr", "stopper"} <= set(payload["extra"])
    assert set(payload["scheduler_state"]) == {"best", "num_bad", "cooldown_counter"}
    assert "counter" in payload["extra"]["stopper"]

    # resume with the real guard: runs to completion from epoch 1
    monkeypatch.undo()
    test_loss, test_corr = train_evaluator.main(
        common + ["--epochs", "2", "--resume"]
    )
    assert test_loss == test_loss  # finite float, run completed

    # completed run removes the preemption checkpoint so a supervisor's
    # redundant --resume cannot rewind to the stale mid-run state (ADVICE r1)
    assert not os.path.exists(ckpt_last)

    import json

    epochs = [json.loads(l)["step"]
              for l in open(os.path.join(out_dir, "metrics.jsonl"))]
    assert 0 in epochs and 1 in epochs and 2 in epochs  # continued, not restarted

    # a further --resume (now from the best-metric checkpoint) seeds the
    # watermarks by evaluating once instead of starting at inf/-inf
    test_loss2, _ = train_evaluator.main(common + ["--epochs", "1", "--resume"])
    assert test_loss2 == test_loss2


def test_sampled_trainer_checkpoint_and_resume(tmp_path, monkeypatch):
    from pygcn_tpu.apps import train_sampled

    out_dir = str(tmp_path / "sampled_pre")
    common = [
        "--n_nodes", "1500", "--fanouts", "4", "4", "--batch_size", "128",
        "--prefetch", "0",
        "--out_dir", out_dir,
    ]

    class InstantPreemption:
        requested = True

        def __enter__(self):
            return self

        def __exit__(self, *exc):
            return None

    import pygcn_tpu.train as train_pkg

    monkeypatch.setattr(train_pkg, "PreemptionGuard", InstantPreemption)
    assert train_sampled.main(common + ["--epochs", "3"]) is None
    ckpt = os.path.join(out_dir, "checkpoint_last.pkl")
    assert os.path.exists(ckpt)

    from pygcn_tpu.train import get_checkpoint_state

    _, epoch, _, _ = get_checkpoint_state(ckpt)
    assert epoch == 0  # mid-epoch preemption restarts the interrupted epoch

    monkeypatch.undo()
    acc = train_sampled.main(common + ["--epochs", "2", "--resume"])
    assert 0.0 <= acc <= 1.0  # resumed run completes
    _, epoch, _, _ = get_checkpoint_state(ckpt)
    assert epoch == 2  # epoch-boundary checkpoints advanced past both epochs
