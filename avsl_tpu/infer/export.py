"""Serialized-program export: ship the serving decode program as a
self-contained StableHLO artifact (`jax.export`).

The reference deploys by shipping Python + torch checkpoints. Here the
ENTIRE serving computation — log-mel frontend, encoder, KV-cache init,
greedy/beam decode loop, with the weights embedded as constants — is one
exported XLA program: a serving runtime (or a later framework version)
replays it with `load_exported(path)` without any model code, and a CPU
host can cross-compile the artifact for TPU (`platforms=("tpu",)`)
without owning a chip. Versioned StableHLO gives the compatibility
guarantees jit caches cannot (jax.export docs: forward compatibility
window across jax releases).

Artifact layout: ``<path>`` (serialized Exported bytes) +
``<path>.json`` (manifest: input shapes/dtypes, platforms, eot id,
language, tokenizer hints) so a runtime can validate feeds before
loading gigabytes.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Sequence, Tuple


def export_serving_program(
    transcriber,
    path: str,
    platforms: Optional[Sequence[str]] = None,
) -> Dict[str, Any]:
    """Export ``transcriber``'s compiled decode program (the same
    ``run(audio, video, prompt)`` the StreamingTranscriber dispatches) to
    ``path`` as serialized StableHLO, plus a ``<path>.json`` manifest.

    ``platforms``: lowering platforms, e.g. ``("tpu",)`` to cross-export
    for TPU serving from a CPU host; defaults to the current backend.
    Returns the manifest dict.
    """
    import jax
    import numpy as np
    from jax import export as jexport

    if transcriber.mesh is not None:
        raise ValueError(
            "cannot export a mesh-sharded transcriber: the artifact would "
            "embed a fixed device assignment, contradicting self-contained "
            "replay — export the single-device program and shard at load"
        )
    b = transcriber.batch_size
    audio = jax.ShapeDtypeStruct((b, transcriber.audio_max_length), np.float32)
    video = jax.ShapeDtypeStruct(
        (b, transcriber.video_frames, transcriber.crop, transcriber.crop, 1),
        np.float32,
    )
    prompt = jax.ShapeDtypeStruct(transcriber._prompt.shape, np.int32)

    fn = transcriber._run
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    exported = jexport.export(fn, **kwargs)(audio, video, prompt)
    blob = exported.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)

    manifest = {
        "format": "jax.export/stablehlo",
        "platforms": list(exported.platforms),
        "calling_convention_version": exported.calling_convention_version,
        "inputs": [
            {"name": "audio", "shape": list(audio.shape), "dtype": "float32"},
            {"name": "video", "shape": list(video.shape), "dtype": "float32"},
            {"name": "prompt", "shape": list(prompt.shape), "dtype": "int32"},
        ],
        "outputs": "(tokens [B, max_new_tokens] int32, avg_logprob [B] f32)"
        if transcriber.beam_size == 1
        else "(tokens [B, max_new_tokens] int32, beam_score [B] f32)",
        "eot_id": int(transcriber.tokenizer.eot),
        "lang": transcriber.lang,
        "beam_size": transcriber.beam_size,
        "max_new_tokens": transcriber.max_new_tokens,
        # decode-variant record: what the program embeds (quantization,
        # draft speculation) and what it CANNOT carry (the host-side
        # temperature-fallback retry loop runs outside the program)
        "quantize": transcriber.quantize,
        "kv_int8": transcriber.kv_int8,
        "speculative": transcriber.draft_model is not None,
        "spec_k": transcriber.spec_k if transcriber.draft_model is not None else None,
        "host_side_not_exported": (
            ["temperature_fallback"] if transcriber.temperature_fallback else []
        ),
        "bytes": len(blob),
    }
    with open(path + ".json", "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


def load_exported(path: str) -> Tuple[Any, Dict[str, Any]]:
    """Deserialize an exported serving program; returns ``(call, manifest)``
    where ``call(audio, video, prompt)`` replays the program (via
    ``jax.jit`` of ``Exported.call``) on any platform the artifact was
    lowered for."""
    import jax
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())
    manifest = {}
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            manifest = json.load(f)
    # jit the call: eager Exported.call re-stages the (potentially
    # multi-hundred-MB) program on every invocation; under jit the replay
    # is a cached compiled dispatch
    return jax.jit(exported.call), manifest
