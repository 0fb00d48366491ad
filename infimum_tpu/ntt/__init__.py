from .ntt import ntt_host, intt_host, ntt_device, intt_device, coset_ntt_device, coset_intt_device

__all__ = [
    "ntt_host",
    "intt_host",
    "ntt_device",
    "intt_device",
    "coset_ntt_device",
    "coset_intt_device",
]
