"""Autotune table plumbing (reference counterpart: optimal_scheme JSON
loading, /root/reference/jqc/backend/jk.py:38-53; the timing harness
itself needs a real device and is exercised by examples/benchmarks)."""

import json
import os

from joltqc_tpu.utils import autotune


def test_autotune_table_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setenv("JQC_CACHE_DIR", str(tmp_path))
    autotune._TABLE = None
    ls, nprims, tier = (1, 0, 1, 0), (3, 3, 3, 3), "df64"
    assert autotune.tuned_chunk(ls, nprims, tier) is None

    path = autotune._table_path()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump({autotune._key(ls, nprims, tier): 512}, f)
    autotune._TABLE = None
    assert autotune.tuned_chunk(ls, nprims, tier) == 512
    autotune._TABLE = None  # don't leak into other tests


def test_chunk_size_respects_table(monkeypatch):
    from joltqc_tpu.scf.jk_contracted import _chunk_size

    monkeypatch.setattr(
        "joltqc_tpu.utils.autotune.tuned_chunk", lambda *a: 2048
    )
    assert _chunk_size((0, 0, 0, 0), ntasks=100000, nprims=(1, 1, 1, 1), tier="f32") == 2048
    # tiny task lists still clamp
    assert _chunk_size((0, 0, 0, 0), ntasks=70, nprims=(1, 1, 1, 1), tier="f32") == 128
