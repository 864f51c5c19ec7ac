# coding: utf-8
"""deepvoice3_pytorch_tpu — a TPU-native (JAX/XLA/Pallas/pjit) re-design of
the r9y9/deepvoice3_pytorch text-to-speech framework.

Same capability envelope as the reference (three builders, multi-speaker,
guided attention, incremental decoding, hparams-preset CLI contract), built
TPU-first: functional param pytrees, lax.scan autoregressive decoding over
ring buffers, on-device DSP, data-parallel jax.sharding meshes.
"""

__version__ = "0.1.0"

from . import builder  # noqa: F401
from .builder import (  # noqa: F401
    TTSModelConfig, deepvoice3, nyanko, deepvoice3_multispeaker,
    model_init, model_forward, model_synthesize)


def tts_stream(*args, **kwargs):
    """Streaming synthesis generator — see streaming.tts_stream (lazy
    import: the streaming module pulls in the fused-decode kernel)."""
    from . import streaming

    return streaming.tts_stream(*args, **kwargs)
