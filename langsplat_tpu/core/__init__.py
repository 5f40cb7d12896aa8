from langsplat_tpu.core import sh, transforms, losses

__all__ = ["sh", "transforms", "losses"]
