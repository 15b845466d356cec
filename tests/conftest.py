"""Shared fixtures. Golden objects from FIXTURES.md (originally from the
reference test suite, /root/reference/tests/test_matrix.py:31-168)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dask_grblas_spark as gb  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = gb.get_session()
    s.sparkContext.setLogLevel("ERROR")
    return s


# golden data (FIXTURES.md section 2)
V_DATA = {0: 0, 1: -20, 2: 30, 4: 40, 6: 50}                       # INT64 size 7
W_DATA = {0: 1.0, 1: 2.0, 3: 3.0, 4: -4.0, 6: 0.0}                 # FP64 size 7
VM_DATA = {0: True, 1: False, 2: False, 3: True, 4: True}          # BOOL size 7
SM_DATA = {0: False, 3: False, 4: False}                           # BOOL size 7
A_ROWS = [3, 0, 3, 5, 6, 0, 6, 1, 6, 2, 4, 1]
A_COLS = [0, 1, 2, 2, 2, 3, 3, 4, 4, 5, 5, 6]
A_VALS = [3, 2, 3, 1, 5, 3, 7, 8, 3, 1, 7, 4]
A_DATA = {(r, c): v for r, c, v in zip(A_ROWS, A_COLS, A_VALS)}
MVM_DATA = {(0, 2): True, (1, 5): True, (3, 3): True, (4, 2): True, (6, 6): True}
MSM_DATA = {(0, 2): True, (1, 5): False, (3, 3): True, (4, 2): False, (6, 6): False}


def vec_from(data: dict, size=7, dtype=None):
    if not data:
        return gb.Vector.new(dtype or "INT64", size)
    return gb.Vector.from_values(list(data.keys()), list(data.values()),
                                 size=size, dtype=dtype)


def mat_from(data: dict, nrows=7, ncols=7, dtype=None):
    if not data:
        return gb.Matrix.new(dtype or "INT64", nrows, ncols)
    rows = [k[0] for k in data]
    cols = [k[1] for k in data]
    return gb.Matrix.from_values(rows, cols, list(data.values()),
                                 nrows=nrows, ncols=ncols, dtype=dtype)


@pytest.fixture()
def v(spark):
    return vec_from(V_DATA)


@pytest.fixture()
def w(spark):
    return vec_from(W_DATA)


@pytest.fixture()
def vm(spark):
    return vec_from(VM_DATA, dtype="BOOL")


@pytest.fixture()
def sm(spark):
    return vec_from(SM_DATA, dtype="BOOL")


@pytest.fixture()
def A(spark):
    return mat_from(A_DATA)


@pytest.fixture()
def mvm(spark):
    return mat_from(MVM_DATA, dtype="BOOL")


@pytest.fixture()
def msm(spark):
    return mat_from(MSM_DATA, dtype="BOOL")


def mask_variants(mask_obj, mask_data: dict):
    """(engine_mask, model_mask_keys, complement) for the 5-way grid."""
    from tests.model import mask_keys_of

    return [
        (None, None, False),
        (mask_obj.S, mask_keys_of(mask_data, False), False),
        (mask_obj.V, mask_keys_of(mask_data, True), False),
        (~mask_obj.S, mask_keys_of(mask_data, False), True),
        (~mask_obj.V, mask_keys_of(mask_data, True), True),
    ]
