from .hf import RHF  # noqa: F401
from .jk_contracted import JKEngine  # noqa: F401
from .jk_pair import PairJKEngine  # noqa: F401
from .rks import RKS  # noqa: F401
