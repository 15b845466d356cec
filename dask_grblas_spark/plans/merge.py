"""The single descriptor merge pipeline: mask x accum x replace x region.

Every mutating op in the reference funnels through `Updater.update`
(/root/reference/dask_grblas/expr.py:566-649) into the masked/accum merge
at base.py:279-334, with the GrB_assign vs GxB_subassign split at
expr.py:1036-1071. This module is the Spark analogue — ONE pipeline built
from joins/unions that implements:

    C(mask, accum, replace)[region] << new

GraphBLAS spec semantics implemented here:
  Z = accum ? (C_in_region UNION-merge new, combining with accum) : new
  inside region : result = Z where mask passes;
                  old kept where mask fails unless replace (then deleted)
  outside region: old kept, except GrB_assign-style replace deletes old
                  entries failing the mask anywhere in C (mask_scope
                  'target'); GxB_subassign prunes only inside the region
                  (mask_scope 'region').

All presence tests are row-existence (values are never NULL by
construction), so the whole pipeline is shuffles on the entry keys —
no densification, no driver round-trips. At scale each step is a plain
equi-join Catalyst can plan (broadcast when mask/index sides are small).
"""

from __future__ import annotations

from functools import reduce as _reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _join_cond(keys, left="l", right="r") -> Column:
    return _reduce(lambda a, b: a & b,
                   [F.col(f"{left}.{k}") == F.col(f"{right}.{k}") for k in keys])


def union_merge(a_df: DataFrame, b_df: DataFrame, keys: list[str],
                combine, value_col: str = "v",
                lift_l=None, lift_r=None) -> DataFrame:
    """Set-UNION merge on keys: both present -> combine(a, b); single
    present -> pass value through UNCHANGED (the ewise_add / accum
    semantics — NOT coalesce-to-zero; SURVEY.md section 7 'What's hard').

    lift_l / lift_r: optional Column transforms applied to SINGLE-present
    values when the pass-through storage differs from combine's output
    storage (real inputs + complex output, e.g. binary.cmplx) — a CASE
    WHEN cannot mix double and struct branches."""
    a = a_df.alias("l")
    b = b_df.alias("r")
    j = a.join(b, _join_cond(keys), "full_outer")
    lv, rv = F.col(f"l.{value_col}"), F.col(f"r.{value_col}")
    out_keys = [F.coalesce(F.col(f"l.{k}"), F.col(f"r.{k}")).alias(k) for k in keys]
    val = (F.when(lv.isNotNull() & rv.isNotNull(), combine(lv, rv))
            .when(lv.isNotNull(), lift_l(lv) if lift_l is not None else lv)
            .otherwise(lift_r(rv) if lift_r is not None else rv))
    return j.select(*out_keys, val.alias(value_col))


def check_mask_keys(mask_keys: DataFrame, keys: list[str]):
    """A mask's key columns must be exactly the target's keys — a Matrix
    mask applied to a Vector output would otherwise semi-join on the row
    key alone and silently pass wrong rows (grblas raises; reference
    test_resolving.py:102-115)."""
    if set(mask_keys.columns) != set(keys):
        want = "Vector" if len(keys) == 1 else "Matrix"
        raise TypeError(f"Mask object must be type {want}")


def apply_mask(df: DataFrame, keys: list[str], mask_keys: DataFrame,
               complement: bool, keep_pass: bool = True) -> DataFrame:
    """Keep rows passing (keep_pass) or failing (not keep_pass) the mask."""
    check_mask_keys(mask_keys, keys)
    semi = complement == (not keep_pass)  # XOR
    how = "left_semi" if semi else "left_anti"
    return df.join(mask_keys, on=keys, how=how)


def split_region(old_df: DataFrame, keys: list[str], region) -> tuple[DataFrame, DataFrame]:
    """Split old entries into (inside-region, outside-region).

    region: None -> whole object; ("pred", fn) predicate on key columns;
    ("df", keys_df) explicit key membership; ("axis", [(col, axis_spec)])
    per-axis membership where axis_spec is ("pred", fn(Column)->Column),
    ("df", one-column DataFrame named `col`) or ("all", None).
    """
    if region is None:
        return old_df, old_df.limit(0)
    kind, spec = region
    if kind == "pred":
        pred = spec(old_df)
        return old_df.filter(pred), old_df.filter(~pred)
    if kind == "df":
        return (old_df.join(spec, on=keys, how="left_semi"),
                old_df.join(spec, on=keys, how="left_anti"))
    if kind == "axis":
        inside = old_df
        all_pred = True
        pred_acc = F.lit(True)
        for col, (akind, aspec) in spec:
            if akind == "all":
                continue
            if akind == "pred":
                pred_acc = pred_acc & aspec(F.col(col))
            else:
                all_pred = False
        if all_pred:
            return old_df.filter(pred_acc), old_df.filter(~pred_acc)
        for col, (akind, aspec) in spec:
            if akind == "all":
                continue
            if akind == "pred":
                inside = inside.filter(aspec(F.col(col)))
            else:  # df membership for this axis
                adf = aspec
                if adf.columns != [col]:
                    adf = adf.select(F.col(adf.columns[0]).alias(col))
                inside = inside.join(F.broadcast(adf.distinct()), on=col,
                                     how="left_semi")
        outside = old_df.join(inside.select(*keys), on=keys, how="left_anti")
        return inside, outside
    raise ValueError(f"unknown region kind {kind!r}")


def merge_into(old_df: DataFrame, new_df: DataFrame, keys: list[str], *,
               accum=None, mask=None, replace: bool = False,
               region=None, mask_scope: str = "target") -> DataFrame:
    """The descriptor merge (see module docstring).

    accum: callable (old_col, new_col) -> Column, already dtype-typed.
    mask : (mask_keys_df, complement) in TARGET coordinates, or None.
    region: see split_region. mask_scope: 'target' (GrB_assign / whole-
    object update) or 'region' (GxB_subassign).
    """
    old_in, old_out = split_region(old_df, keys, region)

    if accum is not None:
        z = union_merge(old_in, new_df, keys, accum)
    else:
        z = new_df

    if mask is not None:
        mask_keys, complement = mask
        inside = apply_mask(z, keys, mask_keys, complement, keep_pass=True)
        if not replace:
            kept_old = apply_mask(old_in, keys, mask_keys, complement, keep_pass=False)
            inside = inside.unionByName(kept_old)
    else:
        inside = z

    outside = old_out
    if region is not None and replace and mask is not None and mask_scope == "target":
        mask_keys, complement = mask
        outside = apply_mask(outside, keys, mask_keys, complement, keep_pass=True)

    if region is None:
        return inside
    return inside.unionByName(outside)
