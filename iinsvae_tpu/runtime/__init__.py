from iinsvae_tpu.runtime.native import (
    native_available,
    build_native,
    read_csv,
    ewine_extract,
    features,
    Standardizer as NativeStandardizer,
)

__all__ = [
    "native_available",
    "build_native",
    "read_csv",
    "ewine_extract",
    "features",
    "NativeStandardizer",
]
