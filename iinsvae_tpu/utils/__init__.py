from iinsvae_tpu.utils.profiling import StepTimer, profile_trace, device_sync
from iinsvae_tpu.utils.prng import key_tree

__all__ = ["StepTimer", "profile_trace", "device_sync", "key_tree"]
