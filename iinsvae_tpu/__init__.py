"""iinsvae_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for IIns-VAE.

A ground-up rebuild of the capabilities of the reference PyTorch research code
(JadeLilyx/IIns-VAE): a disentangling semi-supervised VAE for UWB channel
impulse responses (CIR) that jointly

  1. reconstructs the CIR from a *range code* and an *env code*
     (AdaIN-conditioned decoder),
  2. regresses the ranging error from the range code ("Restorer"),
  3. classifies the environment from the env code ("Classifier"),

plus the supervised joint network (EMNet), the separated two-stage variant,
and the hand-crafted-feature + SVM classical baseline.

Design (TPU-first, not a port):
  * channels-last (NWC / NHWC) layouts; all Conv1d hot paths lower to im2col
    matmuls that map onto the MXU (ops/conv.py),
  * exact-semantics adaptive pooling expressed as a precomputed pooling
    matmul (ops/pooling.py),
  * functional AdaIN: per-sample (gamma, beta) predicted by an MLP from the
    env code and *threaded* through the decoder call (models/decoders.py) —
    no module-state mutation as in the reference (models.py:452-464),
  * whole dataset resident in HBM; the epoch loop is a lax.scan inside a
    single jit (training/loop.py),
  * scaling via jax.sharding.Mesh + NamedSharding (parallel/mesh.py):
    batch over the 'data' axis, wide MLP/linear layers over 'model'.
"""

__version__ = "0.1.0"

# Top-level convenience API (lazy, PEP 562 — importing the package stays
# cheap; submodules load on first attribute access).
_EXPORTS = {
    "IInsVAE": "iinsvae_tpu.models",
    "Encoder": "iinsvae_tpu.models",
    "Decoder": "iinsvae_tpu.models",
    "Restorer": "iinsvae_tpu.models",
    "Classifier": "iinsvae_tpu.models",
    "EMNet": "iinsvae_tpu.models",
    "EMNetLoop": "iinsvae_tpu.models",
    "Config": "iinsvae_tpu.config",
    "parse": "iinsvae_tpu.config",
    "Predictor": "iinsvae_tpu.serving",
    "load_serving": "iinsvae_tpu.serving",
}

__all__ = ["__version__", *_EXPORTS]


def __getattr__(name):
    if name in _EXPORTS:
        import importlib

        return getattr(importlib.import_module(_EXPORTS[name]), name)
    raise AttributeError(f"module 'iinsvae_tpu' has no attribute {name!r}")


def __dir__():
    # real module attributes (__name__, __path__, imported submodules, ...)
    # plus the lazy exports — not only __all__ (ADVICE round 3)
    return sorted(set(globals()) | set(_EXPORTS))
