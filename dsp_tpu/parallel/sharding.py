"""Mesh-sharded classification (shard_map + XLA collectives).

Communication design (BASELINE.json config 4: "template bank sharded
across a v4-8 mesh"; scaling-book recipe — shard, let XLA insert
collectives over ICI):

* queries  [B, T, F]  sharded P('data', None, None)
* bank     [K, U, F]  sharded P('bank', None, None)
* each device computes its local [B/data, K/bank] DTW block entirely
  on-chip (MXU cost matmuls + min-plus scans);
* the cross-device reduction is an argmin over the bank axis carried as
  (min_dist, global_template_idx) pairs — an `all_gather` of TWO scalars
  per query per bank shard over ICI, never the full distance matrix.

Everything is a single shard_map-ed XLA program; there is no host-side
orchestration per shard.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from dsp_tpu.config import DtwConfig, PipelineConfig
from dsp_tpu.ops import dtw as jdtw
from dsp_tpu.ops import frontend as fe
from dsp_tpu.parallel.mesh import BANK_AXIS, DATA_AXIS
from dsp_tpu import pipeline as pl

BIG = jdtw.BIG


def classify_sharded(
    mesh: Mesh,
    queries: jax.Array, q_lens: jax.Array,
    bank: jax.Array, bank_lens: jax.Array,
    bank_label_ids: jax.Array,
    bank_valid: jax.Array | None = None,
    cfg: DtwConfig = DtwConfig(),
    precision=jax.lax.Precision.HIGHEST,
):
    """All-pairs DTW classify over a ('data','bank') mesh.

    Args:
      queries/q_lens: [B, T, F] / [B], B divisible by mesh 'data' size.
      bank/bank_lens: [K, U, F] / [K], K divisible by mesh 'bank' size.
      bank_label_ids: [K] int32, replicated.
      bank_valid: [K] bool; False marks padding templates (excluded).

    Returns (label_ids [B], best_dist [B]).
    """
    if bank_valid is None:
        bank_valid = jnp.ones(bank.shape[0], dtype=bool)

    def local(q, ql, b, bl, bv):
        # q [Bl,T,F], b [Kl,U,F]; all other operands replicated
        kl = b.shape[0]
        d = jdtw.dtw_batch(q, ql, b, bl, cfg, precision)         # [Bl, Kl]
        d = jnp.where(bv[None, :], d, BIG)
        larg = jnp.argmin(d, axis=-1)                            # [Bl]
        lmin = jnp.take_along_axis(d, larg[:, None], axis=-1)[:, 0]
        offset = jax.lax.axis_index(BANK_AXIS) * kl
        gidx = offset + larg
        # tiny cross-shard reduction: 2 scalars/query/shard over ICI
        mins = jax.lax.all_gather(lmin, BANK_AXIS, axis=-1, tiled=False)  # [Bl, nb]
        idxs = jax.lax.all_gather(gidx, BANK_AXIS, axis=-1, tiled=False)
        sel = jnp.argmin(mins, axis=-1)
        best_dist = jnp.take_along_axis(mins, sel[:, None], axis=-1)[:, 0]
        best_idx = jnp.take_along_axis(idxs, sel[:, None], axis=-1)[:, 0]
        return best_idx, best_dist

    mapped = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(BANK_AXIS), P(BANK_AXIS), P(BANK_AXIS)),
        out_specs=(P(DATA_AXIS), P(DATA_AXIS)),
        # outputs are replicated over 'bank' by the all_gather+argmin, but
        # that cannot be statically inferred — disable the vma check
        check_vma=False,
    )
    best_idx, best_dist = mapped(queries, q_lens, bank, bank_lens, bank_valid)
    return jnp.take(bank_label_ids, best_idx), best_dist


def recognize_sharded(
    mesh: Mesh,
    signals: jax.Array, n_samples: jax.Array,
    mats: fe.FrontendMatrices,
    bank_feats: jax.Array, bank_lens: jax.Array,
    bank_label_ids: jax.Array,
    bank_valid: jax.Array | None = None,
    cfg: PipelineConfig = PipelineConfig(),
    precision=jax.lax.Precision.HIGHEST,
):
    """Full device pipeline over the mesh: padded signals -> labels.

    Feature extraction is embarrassingly data-parallel (jit propagates the
    'data' sharding through the vmapped front-end with zero collectives);
    classification is the bank-sharded argmin above.
    """
    feats = pl.extract_features(signals, n_samples, mats, cfg, precision)
    return classify_sharded(
        mesh, feats.feats, feats.length, bank_feats, bank_lens,
        bank_label_ids, bank_valid, cfg.dtw, precision)
