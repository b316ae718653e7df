from .hf import RHF  # noqa: F401
from .jk import JKEngine  # noqa: F401
from .rks import RKS  # noqa: F401
