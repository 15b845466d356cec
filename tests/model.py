"""Pure-Python dict-based GraphBLAS model — the differential-test oracle.

Mirrors the reference's methodology (SURVEY.md section 5: every test runs
the same expression against single-node grblas ground truth). We have no
grblas in this environment, so ground truth is this tiny dense-dict model:
vectors are {index: value}, matrices {(i, j): value}; absence of key =
absence of entry.
"""

from __future__ import annotations


def ewise_add(a: dict, b: dict, op):
    out = {}
    for k in set(a) | set(b):
        if k in a and k in b:
            out[k] = op(a[k], b[k])
        elif k in a:
            out[k] = a[k]
        else:
            out[k] = b[k]
    return out


def ewise_mult(a: dict, b: dict, op):
    return {k: op(a[k], b[k]) for k in set(a) & set(b)}


def apply(a: dict, op):
    return {k: op(v) for k, v in a.items()}


def mxv(A: dict, v: dict, add, mult):
    out = {}
    for (i, j), av in A.items():
        if j in v:
            p = mult(av, v[j])
            out[i] = add(out[i], p) if i in out else p
    return out


def vxm(v: dict, A: dict, add, mult):
    out = {}
    for (i, j), av in A.items():
        if i in v:
            p = mult(v[i], av)
            out[j] = add(out[j], p) if j in out else p
    return out


def mxm(A: dict, B: dict, add, mult):
    out = {}
    for (i, j), av in A.items():
        for (j2, k), bv in B.items():
            if j == j2:
                p = mult(av, bv)
                out[(i, k)] = add(out[(i, k)], p) if (i, k) in out else p
    return out


def reduce_rowwise(A: dict, add):
    out = {}
    for (i, _j), v in A.items():
        out[i] = add(out[i], v) if i in out else v
    return out


def reduce_columnwise(A: dict, add):
    out = {}
    for (_i, j), v in A.items():
        out[j] = add(out[j], v) if j in out else v
    return out


def reduce_scalar(a: dict, add):
    vals = list(a.values())
    if not vals:
        return None
    acc = vals[0]
    for v in vals[1:]:
        acc = add(acc, v)
    return acc


def mask_pass(key, mask_keys, complement):
    if mask_keys is None:
        return True
    return (key in mask_keys) != complement


def mask_keys_of(mask_dict: dict, value_mask: bool):
    """Keys passing the base (non-complemented) test."""
    if value_mask:
        return {k for k, v in mask_dict.items() if v}
    return set(mask_dict)


def merge(old: dict, new: dict, *, accum=None, mask_keys=None,
          complement=False, replace=False, region=None):
    """The descriptor merge: C(mask, accum, replace)[region] << new.

    region: None (whole object) or a set of keys addressed by the assign.
    GrB_assign scope: mask+replace prune applies across the whole target.
    """
    in_region = (lambda k: True) if region is None else (lambda k: k in region)
    if accum is not None:
        z = dict(new)
        for k, v in old.items():
            if in_region(k):
                z[k] = accum(v, z[k]) if k in z else v
    else:
        z = dict(new)
    out = {}
    all_keys = set(old) | set(z)
    for k in all_keys:
        passes = mask_pass(k, mask_keys, complement)
        if in_region(k):
            if passes:
                if k in z:
                    out[k] = z[k]
            else:
                if not replace and k in old:
                    out[k] = old[k]
        else:
            if k in old:
                if replace and mask_keys is not None and not passes:
                    continue
                out[k] = old[k]
    return out


def subassign_merge(old: dict, new: dict, *, accum=None, mask_keys=None,
                    complement=False, replace=False, region=None):
    """GxB_subassign: mask/replace scoped to the region only; mask_keys are
    already translated to target coordinates by the caller."""
    in_region = (lambda k: True) if region is None else (lambda k: k in region)
    if accum is not None:
        z = dict(new)
        for k, v in old.items():
            if in_region(k):
                z[k] = accum(v, z[k]) if k in z else v
    else:
        z = dict(new)
    out = {}
    for k in set(old) | set(z):
        if in_region(k):
            passes = mask_pass(k, mask_keys, complement)
            if passes:
                if k in z:
                    out[k] = z[k]
            elif not replace and k in old:
                out[k] = old[k]
        elif k in old:
            out[k] = old[k]
    return out
