"""PySCF adapter plumbing tests (pyscf itself is absent in this image).

The conversion/monkey-patch path requires pyscf and is exercised by
examples/README instructions; here we pin the config semantics and the
import-gating behavior (reference counterpart: get_default_config,
/root/reference/jqc/pyscf/__init__.py:100-118)."""

import pytest

from joltqc_tpu.pyscf import apply, get_default_config, merge_config


def test_default_config():
    cfg = get_default_config()
    assert cfg["jk"] == {"cutoff_fp32": 1e-13, "cutoff_fp64": 1e-6}
    assert cfg["dft"] == {"cutoff_fp32": 1e-13, "cutoff_fp64": 1e-6}


def test_merge_config_overlays_nested():
    cfg = merge_config({"jk": {"cutoff_fp64": 1e-8}})
    assert cfg["jk"]["cutoff_fp64"] == 1e-8
    assert cfg["jk"]["cutoff_fp32"] == 1e-13  # untouched default
    assert cfg["dft"]["cutoff_fp64"] == 1e-6
    # unknown domains pass through
    cfg = merge_config({"ecp": {"x": 1}})
    assert cfg["ecp"] == {"x": 1}


def test_apply_requires_pyscf():
    try:
        import pyscf  # noqa: F401

        pytest.skip("pyscf available; gating path not applicable")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="standalone"):
        apply(object())
