"""Multi-chip parallelism: mesh construction + the sharded JK entry.

The compute path itself lives in the production engine
(scf/jk_contracted.py, ``JKEngine(mesh=...)``); this package provides
the mesh helpers and documents the decomposition (see jk_sharded.py).
"""

from .jk_sharded import sharded_jk_engine, task_mesh

__all__ = ["sharded_jk_engine", "task_mesh"]
