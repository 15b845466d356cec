"""SuiteSparse-extension (`.ss`) namespace: selectk, compactify, flatten,
reshape, split, build_scalar, is_iso.

The reference exposes a `.ss` accessor (/root/reference/dask_grblas/_ss/
vector.py, matrix.py) but only implements `diag`; the rest of the upstream
grblas ss surface is XFAIL'd wholesale in its test port
(/root/reference/tests/from_grblas2/copytests.py:6-100 — test_firstk,
test_compactify, test_split, test_flatten, ...). The semantics here follow
the upstream grblas tests directly (test_vector.py:1392-1533,
test_matrix.py:2758-3300).

Spark shapes, chosen for the 100 TB contract:

* ``selectk`` (vector)      -> ``orderBy(...).limit(k)``: Catalyst plans
  TakeOrderedAndProject — per-partition top-k then a k-row merge on the
  driver side of the exchange. No global sort, no full shuffle.
* ``selectk_rowwise/columnwise`` -> ``row_number`` over a window
  partitioned by the group key: one hash shuffle on the key, streaming
  rank inside each partition. Scale-safe for any number of groups.
* ``compactify`` densely renumbers positions 0..m-1 — an inherently
  global enumeration, planned as a global-window ``row_number`` AFTER the
  kept set is cut down to ``size``/top-k rows (so the single-partition
  window only ever sees the survivors, not the full vector).
* ``flatten``/``reshape`` are pure per-row index arithmetic (no shuffle).
* ``split`` returns lazy slice extracts — block reads prune at the scan.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .dtypes import INT64
from .exceptions import OutputNotEmpty

_HOWS = ("first", "last", "largest", "smallest", "random")


def _order(how: str, idx_cols: list[str], seed: int):
    """Ordering columns for a selection mode. Value modes tie-break on the
    index so results are deterministic (upstream leaves ties unspecified —
    tests accept either; we always produce the same one)."""
    if how == "first":
        return [F.col(c).asc() for c in idx_cols]
    if how == "last":
        return [F.col(c).desc() for c in idx_cols]
    if how == "largest":
        return [F.col("v").desc()] + [F.col(c).asc() for c in idx_cols]
    if how == "smallest":
        return [F.col("v").asc()] + [F.col(c).asc() for c in idx_cols]
    if how == "random":
        return [F.rand(seed).asc()]
    raise ValueError(f"how must be one of {_HOWS}, got {how!r}")


class VectorSS:
    def __init__(self, parent):
        self._parent = parent

    @property
    def is_iso(self) -> bool:
        """All entries share one value (upstream `v.ss.is_iso`)."""
        n = self._parent.df.select("v").distinct().limit(2).count()
        return n == 1

    def build_scalar(self, indices, value):
        """Iso build: every index gets the same value
        (upstream test_vector.py:209-215)."""
        v = self._parent
        if v.nvals > 0:
            raise OutputNotEmpty("vector must be empty before build_scalar()")
        v.build(list(indices), [value] * len(list(indices)))

    def selectk(self, how: str, k: int, *, seed: int = 0):
        """Keep k entries (original indices preserved). 'first'/'last' by
        index, 'largest'/'smallest' by value, 'random' uniform (seeded
        here for reproducibility; upstream is unseeded)."""
        from .core import GrVector
        if k < 0:
            raise ValueError("k must be non-negative")
        v = self._parent
        df = v.df.orderBy(*_order(how, ["i"], seed)).limit(k)
        return GrVector(df.select("i", "v"), v.dtype, v.size)

    def compactify(self, how: str = "first", size=None, *,
                   reverse: bool = False, asindex: bool = False,
                   seed: int = 0):
        """Pack entries into positions 0..m-1 ordered by `how`
        (upstream test_vector.py:1453-1533). `size` sets the result's
        logical size and truncates to its first `size` positions;
        `reverse` flips the final position order; `asindex` stores the
        original index as the value."""
        from .core import GrVector
        v = self._parent
        df = v.df
        if size is not None:
            if size < 0:
                raise ValueError("size must be non-negative")
            # cut to survivors FIRST so the global window below is k-bounded
            df = df.orderBy(*_order(how, ["i"], seed)).limit(size)
        w = Window.orderBy(*_order(how, ["i"], seed))
        val = F.col("i").cast("long") if asindex else F.col("v")
        df = df.select(F.row_number().over(w).alias("__r"), val.alias("v"))
        if reverse:
            m = F.max("__r").over(Window.partitionBy())
            df = df.select((m - F.col("__r")).cast("long").alias("i"), "v")
        else:
            df = df.select((F.col("__r") - 1).cast("long").alias("i"), "v")
        out_size = size if size is not None else v.nvals
        return GrVector(df, INT64 if asindex else v.dtype, out_size)

    def reshape(self, nrows, ncols=None, *, order: str = "rowwise"):
        """Vector of size nrows*ncols -> Matrix (inverse of flatten;
        upstream test_matrix.py:3004-3040)."""
        from .core import GrMatrix
        if ncols is None:  # reshape((r, c)) spelling
            nrows, ncols = nrows
        v = self._parent
        if v.size is not None and v.size != nrows * ncols:
            from .exceptions import DimensionMismatch
            raise DimensionMismatch(
                f"cannot reshape size-{v.size} vector to {nrows}x{ncols}")
        if order == "rowwise":
            df = v.df.select((F.col("i") / ncols).cast("long").alias("i"),
                             F.pmod(F.col("i"), F.lit(ncols)).alias("j"), "v")
        else:
            df = v.df.select(F.pmod(F.col("i"), F.lit(nrows)).alias("i"),
                             (F.col("i") / nrows).cast("long").alias("j"), "v")
        return GrMatrix(df, v.dtype, nrows, ncols)


class MatrixSS:
    def __init__(self, parent):
        self._parent = parent

    @property
    def is_iso(self) -> bool:
        n = self._parent.df.select("v").distinct().limit(2).count()
        return n == 1

    def build_scalar(self, rows, columns, value):
        A = self._parent
        if A.nvals > 0:
            raise OutputNotEmpty("matrix must be empty before build_scalar()")
        A.build(list(rows), list(columns), [value] * len(list(rows)))

    def selectk_rowwise(self, how: str, k: int, *, seed: int = 0):
        """Keep k entries per row — one key shuffle + streaming rank."""
        return self._selectk("i", how, k, seed)

    def selectk_columnwise(self, how: str, k: int, *, seed: int = 0):
        return self._selectk("j", how, k, seed)

    def _selectk(self, key: str, how: str, k: int, seed: int):
        from .core import GrMatrix
        if k < 0:
            raise ValueError("k must be non-negative")
        A = self._parent
        other = "j" if key == "i" else "i"
        w = Window.partitionBy(key).orderBy(*_order(how, [other], seed))
        df = (A.df.withColumn("__r", F.row_number().over(w))
                  .filter(F.col("__r") <= k).select("i", "j", "v"))
        return GrMatrix(df, A.dtype, A.nrows, A.ncols)

    def compactify_rowwise(self, how: str = "first", ncols=None, *,
                           reverse: bool = False, asindex: bool = False,
                           seed: int = 0):
        """Pack each row's entries into columns 0..m_i-1 (upstream
        Matrix.ss.compactify_rowwise). Partitioned window — scale-safe."""
        return self._compactify("i", how, ncols, reverse, asindex, seed)

    def compactify_columnwise(self, how: str = "first", nrows=None, *,
                              reverse: bool = False, asindex: bool = False,
                              seed: int = 0):
        return self._compactify("j", how, nrows, reverse, asindex, seed)

    def _compactify(self, key, how, bound, reverse, asindex, seed):
        from .core import GrMatrix
        A = self._parent
        other = "j" if key == "i" else "i"
        w = Window.partitionBy(key).orderBy(*_order(how, [other], seed))
        val = F.col(other).cast("long") if asindex else F.col("v")
        df = (A.df.select(F.col(key), F.row_number().over(w).alias("__r"),
                          val.alias("v")))
        if bound is not None:
            df = df.filter(F.col("__r") <= bound)
        if reverse:
            m = F.max("__r").over(Window.partitionBy(key))
            pos = (m - F.col("__r")).cast("long")
        else:
            pos = (F.col("__r") - 1).cast("long")
        df = df.select(F.col(key), pos.alias(other), "v") \
               .select("i", "j", "v")
        if bound is None:
            # upstream default: the packed axis is as wide as the fullest
            # group (one partial-aggregated count job)
            row = (A.df.groupBy(key).count()
                       .agg(F.max("count").alias("m")).collect())
            bound = int(row[0]["m"]) if row and row[0]["m"] is not None else 0
        if key == "i":
            nrows, ncols = A.nrows, bound
        else:
            nrows, ncols = bound, A.ncols
        return GrMatrix(df, INT64 if asindex else A.dtype, nrows, ncols)

    def flatten(self, order: str = "rowwise"):
        """Matrix -> Vector with index i*ncols+j (rowwise) or j*nrows+i
        (columnwise). Pure arithmetic, no shuffle
        (upstream test_matrix.py:3004-3040)."""
        from .core import GrVector
        A = self._parent
        if A.nrows is None or A.ncols is None:
            raise ValueError("flatten requires known nrows and ncols")
        if order == "rowwise":
            idx = F.col("i") * A.ncols + F.col("j")
        elif order == "columnwise":
            idx = F.col("j") * A.nrows + F.col("i")
        else:
            raise ValueError("order must be 'rowwise' or 'columnwise'")
        df = A.df.select(idx.cast("long").alias("i"), "v")
        return GrVector(df, A.dtype, A.nrows * A.ncols)

    def split(self, chunks, name=None):
        """Split into a 2-D grid of blocks (inverse of concat; upstream
        test_matrix.py:2758-2772). chunks = [row_spec, col_spec] where a
        spec is an int block size or an explicit list of sizes (None =
        remainder). Blocks are lazy slice extracts — each block's scan
        prunes to its index range."""
        A = self._parent
        bounds = [_chunk_bounds(spec, dim, axis)
                  for spec, dim, axis in
                  ((chunks[0], A.nrows, "row"), (chunks[1], A.ncols, "col"))]
        out = []
        for r1, r2 in bounds[0]:
            row = []
            for c1, c2 in bounds[1]:
                row.append(A[r1:r2, c1:c2].new())
            out.append(row)
        return out


def _chunk_bounds(spec, dim, axis):
    from .exceptions import DimensionMismatch
    if isinstance(spec, int):
        sizes = []
        left = dim
        while left > 0:
            sizes.append(min(spec, left))
            left -= sizes[-1]
    else:
        sizes = list(spec)
        known = sum(s for s in sizes if s is not None)
        nones = sizes.count(None)
        if nones:
            if known > dim:
                raise DimensionMismatch(
                    f"{axis} chunks sum past dimension {dim}")
            rem = dim - known
            sizes = [rem // nones if s is None else s for s in sizes]
        if sum(sizes) != dim:
            raise DimensionMismatch(
                f"{axis} chunks {sizes} do not sum to dimension {dim}")
    bounds, at = [], 0
    for s in sizes:
        bounds.append((at, at + s))
        at += s
    return bounds
