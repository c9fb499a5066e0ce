"""SpMM / SDDMM — the sparse matmul engine.

``spmm(graph, x)`` computes ``A @ x`` choosing among three implementations:

- ``"dense"``   — plain MXU matmul on the densified adjacency (small graphs;
  a 2708² Cora adjacency is 29 MB and the MXU eats it in microseconds).
- ``"bcsr"``    — the Pallas block-sparse kernel (``ops/pallas/bcsr_spmm.py``):
  only nonzero 128×128 tiles are touched, each one an MXU matmul.
- ``"segment"`` — XLA gather + ``segment_sum`` over COO edges; the fully general
  fallback that scales to graphs whose tiles don't fit a dense-tile budget.

Backward passes: the segment/dense paths differentiate through XLA (gather ⇄
scatter-add are transposes of each other, so the VJP *is* the transpose SpMM).
The BCSR path pairs the forward kernel with a transpose-BCSR kernel via
``custom_vjp`` (``A^T`` tiles are prebuilt in ``Graph.bcsr_t``; symmetric
normalized adjacencies reuse ``A``'s tiles).

The reference's single sparse op is ``torch.spmm(adj, support)`` at its
``pygcn/layers.py:34``; this module is the TPU-native generalisation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pygcn_tpu.graph.graph import Graph


def _transpose_layout(graph: Graph, fwd, t, name: str):
    """The transpose layout used for the backward/`spmm_t` direction.

    A symmetric graph reuses the forward layout (``A^T == A``). An asymmetric
    graph MUST carry a prebuilt transpose layout: silently reusing the forward
    layout would compute ``A @ g`` where the VJP needs ``A^T @ g`` — a wrong
    gradient with no error. ``Graph.from_coo`` always pairs the layouts; this
    guard catches hand-constructed graphs.
    """
    if graph.is_symmetric:
        return t if t is not None else fwd
    if t is None:
        raise ValueError(
            f"asymmetric graph has a forward {name} layout but no transpose "
            f"{name} layout ({name}_t); the backward SpMM would be wrong. "
            f"Build both (Graph.from_coo does) or mark the graph symmetric."
        )
    return t


def _resolve_impl(graph: Graph, impl: str) -> str:
    if impl != "auto":
        return impl
    if graph.dense is not None:
        return "dense"
    if graph.hybrid is not None and graph.hybrid_t is not None:
        return "hybrid"
    if graph.colpanel is not None and (graph.is_symmetric or graph.colpanel_t is not None):
        return "colpanel"
    if graph.panel is not None and (graph.is_symmetric or graph.panel_t is not None):
        return "panel"
    if graph.ell is not None and graph.ell_t is not None:
        return "ell"
    if graph.bcsr is not None and (graph.is_symmetric or graph.bcsr_t is not None):
        return "bcsr"
    return "segment"


def spmm(graph: Graph, x: jax.Array, impl: str = "auto") -> jax.Array:
    """``A @ x`` for ``x`` of shape ``[n_nodes, H]``, ``[n_nodes]``, or a
    batch ``[B, n_nodes, H]``.

    Batched inputs are folded into a single wide ``[n_nodes, B*H]`` product:
    one big MXU GEMM on the dense path, and amortized per-row gathers on the
    ELL/segment paths (gather cost is per-row and flat up to 512 B/row — see
    PERF_NOTES.md). This replaces the reference's per-sample Python loop at
    ``pygcn/models.py:343-349`` with a single fused product.
    """
    if x.ndim == 3:
        b, n, h = x.shape
        wide = jnp.moveaxis(x, 0, 1).reshape(n, b * h)
        out = spmm(graph, wide, impl)
        return jnp.moveaxis(out.reshape(n, b, h), 1, 0)
    impl = _resolve_impl(graph, impl)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    if impl == "dense":
        if graph.dense is None:
            raise ValueError("graph has no dense layout; build with build_dense=True")
        out = jnp.dot(graph.dense, x, preferred_element_type=x.dtype)
    elif impl == "segment":
        out = _spmm_segment(graph, x)
    elif impl == "ell":
        if graph.ell is None:
            raise ValueError("graph has no ELL layout; build with build_ell=True")
        from pygcn_tpu.ops.ell import ell_spmm_pair

        out = ell_spmm_pair(graph.ell, _transpose_layout(graph, graph.ell, graph.ell_t, "ell"), x)
    elif impl == "hybrid":
        if graph.hybrid is None:
            raise ValueError("graph has no hybrid layout; build with build_hybrid=True")
        from pygcn_tpu.ops.hybrid import hybrid_spmm_pair

        out = hybrid_spmm_pair(
            graph.hybrid, _transpose_layout(graph, graph.hybrid, graph.hybrid_t, "hybrid"), x
        )
    elif impl == "panel":
        if graph.panel is None:
            raise ValueError("graph has no panel layout; build with build_panel=True")
        from pygcn_tpu.ops.panel import panel_spmm_pair

        out = panel_spmm_pair(
            graph.panel, _transpose_layout(graph, graph.panel, graph.panel_t, "panel"), x
        )
    elif impl == "colpanel":
        if graph.colpanel is None:
            raise ValueError("graph has no colpanel layout; build with build_colpanel=True")
        from pygcn_tpu.ops.colpanel import col_panel_spmm_pair

        out = col_panel_spmm_pair(
            graph.colpanel,
            _transpose_layout(graph, graph.colpanel, graph.colpanel_t, "colpanel"),
            x,
        )
    elif impl == "bcsr":
        if graph.bcsr is None:
            raise ValueError("graph has no BCSR layout; build with build_bcsr=True")
        from pygcn_tpu.ops.pallas.bcsr_spmm import bcsr_spmm_vjp

        out = bcsr_spmm_vjp(graph, x)
    else:
        raise ValueError(f"unknown spmm impl {impl!r}")
    return out[:, 0] if squeeze else out


def spmm_t(graph: Graph, x: jax.Array, impl: str = "auto") -> jax.Array:
    """``A^T @ x`` — the transpose product (backward direction)."""
    if graph.is_symmetric:
        return spmm(graph, x, impl)
    if x.ndim == 3:
        b, n, h = x.shape
        wide = jnp.moveaxis(x, 0, 1).reshape(n, b * h)
        out = spmm_t(graph, wide, impl)
        return jnp.moveaxis(out.reshape(n, b, h), 1, 0)
    impl = _resolve_impl(graph, impl)
    # Explicit-impl calls on graphs missing the layout must fail with the
    # same clear ValueError the forward path raises (not an AttributeError
    # from _transpose_layout receiving None for the forward layout too).
    if impl in ("ell", "hybrid", "panel", "colpanel") and getattr(graph, impl) is None:
        raise ValueError(
            f"graph has no {impl} layout; build with build_{impl}=True"
        )
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    if impl == "dense":
        if graph.dense is None:
            raise ValueError("graph has no dense layout; build with build_dense=True")
        out = jnp.dot(graph.dense.T, x, preferred_element_type=x.dtype)
    elif impl == "segment":
        # Swap the roles of senders/receivers. receivers are sorted, senders
        # aren't — segment_sum handles unsorted segment ids fine.
        msg = jnp.take(x, graph.receivers, axis=0) * graph.weights[:, None]
        out = jax.ops.segment_sum(msg, graph.senders, num_segments=graph.n_nodes)
    elif impl == "ell":
        from pygcn_tpu.ops.ell import ell_spmm_pair

        out = ell_spmm_pair(_transpose_layout(graph, graph.ell, graph.ell_t, "ell"), graph.ell, x)
    elif impl == "hybrid":
        from pygcn_tpu.ops.hybrid import hybrid_spmm_pair

        out = hybrid_spmm_pair(
            _transpose_layout(graph, graph.hybrid, graph.hybrid_t, "hybrid"), graph.hybrid, x
        )
    elif impl == "panel":
        from pygcn_tpu.ops.panel import panel_spmm_pair

        out = panel_spmm_pair(
            _transpose_layout(graph, graph.panel, graph.panel_t, "panel"), graph.panel, x
        )
    elif impl == "colpanel":
        from pygcn_tpu.ops.colpanel import col_panel_spmm_pair

        out = col_panel_spmm_pair(
            _transpose_layout(graph, graph.colpanel, graph.colpanel_t, "colpanel"),
            graph.colpanel,
            x,
        )
    elif impl == "bcsr":
        if graph.bcsr_t is None:
            raise ValueError("graph has no transpose BCSR layout")
        from pygcn_tpu.ops.pallas.bcsr_spmm import bcsr_spmm

        out = bcsr_spmm(graph.bcsr_t, x, n_rows=graph.n_nodes)
    else:
        raise ValueError(f"unknown spmm impl {impl!r}")
    return out[:, 0] if squeeze else out


def _spmm_segment(graph: Graph, x: jax.Array) -> jax.Array:
    msg = jnp.take(x, graph.senders, axis=0) * graph.weights[:, None]
    return jax.ops.segment_sum(
        msg,
        graph.receivers,
        num_segments=graph.n_nodes,
        indices_are_sorted=True,
    )


def sddmm(graph: Graph, a: jax.Array, b: jax.Array) -> jax.Array:
    """Sampled dense-dense matmul: per true edge ``(s, r)``, ``<a[r], b[s]>``.

    This is the gradient of ``spmm`` w.r.t. the edge weights — exposed for
    adjacency-learning workloads. Returns ``[E_pad]`` with padding entries 0.
    """
    vals = (jnp.take(a, graph.receivers, axis=0) * jnp.take(b, graph.senders, axis=0)).sum(-1)
    mask = jnp.arange(graph.e_pad) < graph.n_edges
    return jnp.where(mask, vals, 0.0)
