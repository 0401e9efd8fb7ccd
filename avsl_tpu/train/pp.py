"""Pipeline-parallel training: stage-sharded state + flagship encoder pp.

``core/pipeline.py`` provides the GPipe schedule itself; this module makes
it *trainable* — a real optimizer-stepped path, not a dryrun-only demo
(the round-2 advisor flagged sequence parallelism for exactly that):

* :func:`shard_pp_state` places a :class:`~avsl_tpu.train.loop.TrainState`
  on a ``(data, stage)`` mesh with every leaf under the stacked-blocks
  subtree — params AND its optimizer-state mirrors (adam ``mu``/``nu``)
  — sharded ``P('stage', ...)`` layer-wise, everything else replicated.
  Combined with ``make_train_step(..., partitioned_state=True)`` (which
  propagates input shardings instead of forcing replication,
  ``train/loop.py:133``) the optimizer update for each stage's layers
  runs on that stage's devices with no gather.
* :func:`whisper_encoder_pp_forward` runs the REAL flagship Whisper
  encoder (``models/whisper.py:49``) with its transformer stack pipelined:
  conv stem + sinusoid positions on every stage's data shard, then the
  ``block_{i}`` stack via :func:`~avsl_tpu.core.pipeline.pipeline_apply`,
  then ``ln_post``. Exact-parity with ``WhisperEncoder.apply`` is locked
  by ``tests/test_pp_train.py`` (so the mirrored stem cannot drift).

The reference has no pipeline parallelism at all (SURVEY.md §2.8 — DDP
only), so there is no reference behavior to match; correctness is defined
as exact equivalence with the unpipelined model, and the tests assert it
through a full optimizer step.

Note on dropout: the pipelined stack runs the blocks deterministically
(per-tick rng threading through a scanned schedule is not worth the
complexity while the flagship finetune regimes run encoder dropout 0.0).
Pass ``deterministic=False`` paths through the unpipelined step instead.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from avsl_tpu.core.config import WhisperConfig
from avsl_tpu.core.pipeline import STAGE_AXIS, pipeline_apply, stack_block_params
from avsl_tpu.models.layers import LayerNormF32, TransformerBlock, sinusoid_embedding

__all__ = [
    "shard_pp_state",
    "whisper_encoder_pp_forward",
    "split_whisper_encoder_params",
]


def _path_has(path, key: str) -> bool:
    for p in path:
        name = getattr(p, "key", getattr(p, "name", None))
        if name == key:
            return True
    return False


def shard_pp_state(state, mesh: Mesh, blocks_key: str = "blocks"):
    """Place a TrainState (or any pytree) on ``mesh``: leaves living under
    any subtree named ``blocks_key`` get ``P('stage', None, ...)`` (layer
    axis over stages), everything else is replicated.

    Works for ``state.params`` and equally for optimizer mirrors
    (``ScaleByAdamState.mu/.nu`` reuse the params' tree structure, so the
    ``blocks_key`` path test hits them too). Scalar leaves (adam ``count``,
    ``step``) are always replicated.
    """

    def _place(path, leaf):
        if _path_has(path, blocks_key) and getattr(leaf, "ndim", 0) >= 1:
            spec = P(STAGE_AXIS, *([None] * (leaf.ndim - 1)))
        else:
            spec = P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(_place, state)


def split_whisper_encoder_params(
    enc_params: dict, n_layers: int
) -> Tuple[Any, dict]:
    """Whisper encoder params -> (stacked ``block_{i}`` tree [L, ...], stem).

    ``stem`` keeps ``conv1``/``conv2``/``ln_post`` (and anything else
    non-block). Thin wrapper over
    :func:`~avsl_tpu.core.pipeline.stack_block_params` named for the
    flagship use."""
    return stack_block_params(enc_params, n_layers, fmt="block_{}")


def whisper_encoder_pp_forward(
    cfg: WhisperConfig,
    stem_params: dict,
    stacked_blocks: Any,
    mel: jnp.ndarray,
    *,
    mesh: Mesh,
    n_microbatches: int,
) -> jnp.ndarray:
    """Flagship Whisper encoder forward with the block stack pipelined.

    Numerically identical (deterministic mode) to
    ``WhisperEncoder.apply`` (models/whisper.py:55-91) — the conv stem and
    ln_post are applied with the SAME flax modules on the same params; only
    the transformer stack runs through the GPipe schedule. Parity is
    asserted by ``tests/test_pp_train.py::test_encoder_pp_matches_module``.

    Args:
      cfg: the WhisperConfig (audio dims; ``cfg.remat`` is ignored — the
        scan-over-layers inside each stage already bounds live memory).
      stem_params / stacked_blocks: from
        :func:`split_whisper_encoder_params`.
      mel: [B, n_mels, T] with B divisible by ``n_microbatches`` and the
        microbatch by the mesh's data-axis size.
    """
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    pdtype = jnp.float32

    x = mel.astype(dtype).transpose(0, 2, 1)
    x = nn.Conv(
        cfg.n_audio_state, (3,), padding=1, dtype=dtype, param_dtype=pdtype
    ).apply({"params": stem_params["conv1"]}, x)
    x = nn.gelu(x, approximate=False)
    x = nn.Conv(
        cfg.n_audio_state, (3,), strides=(2,), padding=1,
        dtype=dtype, param_dtype=pdtype,
    ).apply({"params": stem_params["conv2"]}, x)
    x = nn.gelu(x, approximate=False)
    pos = sinusoid_embedding(cfg.n_audio_ctx, cfg.n_audio_state)[: x.shape[1]]
    x = x + jnp.asarray(pos, dtype)

    block = TransformerBlock(
        d_model=cfg.n_audio_state,
        n_heads=cfg.n_audio_head,
        d_ff=4 * cfg.n_audio_state,
        dropout=0.0,
        dtype=dtype,
        param_dtype=pdtype,
    )

    def block_fn(lp, h, _extras):
        out, _ = block.apply({"params": lp}, h)
        return out

    x = pipeline_apply(
        block_fn, stacked_blocks, x, mesh=mesh, n_microbatches=n_microbatches
    )
    return LayerNormF32(param_dtype=pdtype).apply(
        {"params": stem_params["ln_post"]}, x
    )
