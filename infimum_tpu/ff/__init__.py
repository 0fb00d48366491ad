from .bn254 import FQ_MOD, FR_MOD, fr_inv, fq_inv, fr_pow, FR_TWO_ADICITY, FR_TWO_ADIC_ROOT
from .limbs import (
    NLIMBS,
    LIMB_BITS,
    LIMB_MASK,
    to_limbs,
    from_limbs,
    batch_to_limbs,
    batch_from_limbs,
)
from .fp import FpCtx, FR_CTX, FQ_CTX

__all__ = [
    "FQ_MOD",
    "FR_MOD",
    "fr_inv",
    "fq_inv",
    "fr_pow",
    "FR_TWO_ADICITY",
    "FR_TWO_ADIC_ROOT",
    "NLIMBS",
    "LIMB_BITS",
    "LIMB_MASK",
    "to_limbs",
    "from_limbs",
    "batch_to_limbs",
    "batch_from_limbs",
    "FpCtx",
    "FR_CTX",
    "FQ_CTX",
]
