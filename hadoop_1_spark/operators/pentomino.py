"""Distributed pentomino solver — a REAL exact-cover search replacing the
round-3 8-queens stand-in (SURVEY.md §2.11; reference
examples/dancing/DistributedPentomino.java:37-75, Pentomino.java,
DancingLinks.java).

Model (Pentomino.initialize, Pentomino.java:368-390): one exact-cover
column per board cell plus one per piece; a row is a concrete placement
(piece, orientation, offset) marking its five cells and its piece column.
The first piece ("x") is restricted to the upper-left quadrant
(generateRows' upperLeft flag + isSide, Pentomino.java:292-294) which
eliminates the 4 board symmetries — the 6x10 board then has exactly 2339
solutions, the published count of distinct 6x10 pentomino tilings.

Search is Knuth's Algorithm X (what DancingLinks implements with linked
nodes; sets are the idiomatic Python encoding — same column-selection
heuristic, fewest-candidates-first, same enumeration order). Distribution
follows DistributedPentomino's scheme: ``split(depth)`` enumerates every
prefix of the first ``depth`` row choices (DancingLinks.split:411), each
prefix becomes one task, and tasks run embarrassingly parallel with
bounded memory (the model rebuilds deterministically from (width, height)
inside each task — nothing is shipped but the prefix ints).

Scale shape: the prefix list is the unit of parallelism exactly as in the
reference (a 100-node cluster gets depth+1 to make more, finer tasks);
per-task state is the O(columns + rows) cover structure, solutions are
counted, never materialized to the driver.
"""

from __future__ import annotations

from functools import lru_cache

# Piece set, verbatim puzzle data from Pentomino.initializePieces
# (Pentomino.java:269-282): (shape rows, flippable, distinct rotations).
PIECES: list[tuple[str, str, bool, int]] = [
    ("x", " x /xxx/ x ", False, 1),
    ("v", "x  /x  /xxx", False, 4),
    ("t", "xxx/ x / x ", False, 4),
    ("w", "  x/ xx/xx ", False, 4),
    ("u", "x x/xxx", False, 4),
    ("i", "xxxxx", False, 2),
    ("f", " xx/xx / x ", True, 4),
    ("p", "xx/xx/x ", True, 4),
    ("z", "xx / x / xx", True, 2),
    ("n", "xx  / xxx", True, 4),
    ("y", "  x /xxxx", True, 4),
    ("l", "   x/xxxx", True, 4),
]


def _cells(shape: str) -> frozenset[tuple[int, int]]:
    return frozenset(
        (y, x)
        for y, line in enumerate(shape.split("/"))
        for x, c in enumerate(line)
        if c == "x"
    )


def _rot(cells: frozenset, h: int, w: int):
    # 90-degree clockwise: (y, x) -> (x, h - 1 - y); new dims (w, h)
    return frozenset((x, h - 1 - y) for y, x in cells), w, h


def _flip(cells: frozenset, h: int, w: int):
    return frozenset((y, w - 1 - x) for y, x in cells), h, w


def orientations(shape: str, flippable: bool, nrot: int):
    """Distinct orientations as (cells, h, w): all 4 rotations of the
    base (and, if flippable, of the mirror), deduplicated by cell set —
    provably complete; the reference's static rotations array (``nrot``)
    encodes the same dedup and is kept as documentation of parity."""
    base = _cells(shape)
    h = len(shape.split("/"))
    w = len(shape.split("/")[0])
    seen, out = set(), []
    variants = [(base, h, w)]
    if flippable:
        variants.append(_flip(base, h, w))
    for cells, ch, cw in variants:
        cur = (cells, ch, cw)
        for _ in range(4):
            key = (cur[1], cur[2], cur[0])
            if key not in seen:
                seen.add(key)
                out.append(cur)
            cur = _rot(*cur)
    return out


def _is_side(offset: int, size: int, board: int) -> bool:
    """Pentomino.isSide: placement's extent within the lower half."""
    return 2 * offset + size <= board


@lru_cache(maxsize=8)
def build_model(width: int, height: int):
    """Deterministic exact-cover model: rows[i] = tuple of column ids
    (cells 0..w*h-1, pieces w*h+idx). Rebuilt identically in every task
    (pure function of the board), so prefixes of row INDEXES transfer."""
    rows: list[tuple[int, ...]] = []
    ncells = width * height
    for idx, (name, shape, flippable, nrot) in enumerate(PIECES):
        upper_left = idx == 0
        for cells, h, w in orientations(shape, flippable, nrot):
            for oy in range(height - h + 1):
                for ox in range(width - w + 1):
                    if upper_left and not (
                        _is_side(ox, w, width) and _is_side(oy, h, height)
                    ):
                        continue
                    cols = tuple(
                        sorted((oy + cy) * width + (ox + cx) for cy, cx in cells)
                    ) + (ncells + idx,)
                    rows.append(cols)
    return rows


class ExactCover:
    """Algorithm X over the row list: fewest-candidates column first,
    rows tried in index order — deterministic, so split/solve agree."""

    def __init__(self, rows: list[tuple[int, ...]], ncols: int):
        self.rows = rows
        self.col_rows: dict[int, set[int]] = {c: set() for c in range(ncols)}
        for i, cols in enumerate(rows):
            for c in cols:
                self.col_rows[c].add(i)

    def _choose(self) -> int | None:
        best, best_n = None, None
        for c, rs in self.col_rows.items():
            n = len(rs)
            if best_n is None or n < best_n or (n == best_n and c < best):
                best, best_n = c, n
                if n == 0:
                    break
        return best

    def _cover(self, row: int) -> list[tuple[int, set[int]]]:
        removed = []
        for c in self.rows[row]:
            if c in self.col_rows:
                removed.append((c, self.col_rows.pop(c)))
        dead = {r for _, rs in removed for r in rs}
        for c, rs in self.col_rows.items():
            inter = rs & dead
            if inter:
                rs -= inter
        return removed

    def _uncover(self, removed: list[tuple[int, set[int]]]) -> None:
        for c, rs in removed:
            self.col_rows[c] = rs
        # restore row memberships in surviving columns
        dead = {r for _, rs in removed for r in rs}
        for r in dead:
            for c in self.rows[r]:
                if c in self.col_rows:
                    self.col_rows[c].add(r)

    def candidates(self) -> list[int]:
        c = self._choose()
        if c is None:
            return []
        return sorted(self.col_rows[c])

    def split(self, depth: int) -> list[tuple[int, ...]]:
        """DancingLinks.split parity: all prefixes of the first ``depth``
        deterministic row choices (shorter prefixes appear when a branch
        bottoms out or solves early)."""
        out: list[tuple[int, ...]] = []

        def rec(prefix: tuple[int, ...], d: int):
            if d == 0 or not self.col_rows:
                out.append(prefix)
                return
            cands = self.candidates()
            if not cands and self.col_rows:
                return  # dead branch: some column uncoverable
            for r in cands:
                removed = self._cover(r)
                rec(prefix + (r,), d - 1)
                self._uncover(removed)

        rec((), depth)
        return out

    def solve(self, prefix: tuple[int, ...] = ()) -> int:
        """Count solutions under a prefix of row choices."""
        applied = []
        for r in prefix:
            applied.append(self._cover(r))
        n = self._count()
        for removed in reversed(applied):
            self._uncover(removed)
        return n

    def _count(self) -> int:
        if not self.col_rows:
            return 1
        total = 0
        for r in self.candidates():
            removed = self._cover(r)
            total += self._count()
            self._uncover(removed)
        return total


def solver(width: int, height: int) -> ExactCover:
    rows = build_model(width, height)
    return ExactCover(rows, width * height + len(PIECES))


def solve_distributed(spark, width: int = 10, height: int = 6, depth: int = 3):
    """DistributedPentomino shape: generate prefixes at ``depth`` on the
    driver (cheap — the branching factor near the root is small), one row
    per prefix, fan out with mapInPandas (each task rebuilds the model and
    counts solutions under its prefix), then ONE aggregation. Returns a
    1-row DataFrame (width, height, n_prefixes, solutions)."""
    import pandas as pd

    prefixes = solver(width, height).split(depth)
    pdf_rows = [(i, ",".join(map(str, p))) for i, p in enumerate(prefixes)]
    df = spark.createDataFrame(pdf_rows, "task_id int, prefix string")
    par = min(len(pdf_rows), spark.sparkContext.defaultParallelism)
    df = df.repartition(par)

    def run(batches):
        for pdf in batches:
            counts = []
            for p in pdf["prefix"]:
                pre = tuple(int(x) for x in p.split(",")) if p else ()
                counts.append(solver(width, height).solve(pre))
            yield pd.DataFrame({"n": counts})

    from pyspark.sql import functions as F

    per_task = df.mapInPandas(run, schema="n long")
    return per_task.agg(
        F.lit(width).cast("int").alias("width"),
        F.lit(height).cast("int").alias("height"),
        F.lit(len(pdf_rows)).cast("long").alias("n_prefixes"),
        F.sum("n").cast("long").alias("solutions"),
    )


# ---------------------------------------------------------------------------
# Sudoku on the same exact-cover engine (examples/dancing/Sudoku.java:25-320)


def parse_sudoku(text: str) -> list[list[int | None]]:
    """Reference puzzle format (Sudoku.java:140-152, puzzle1.dta): one
    row per line, space-separated digits with '?' for blanks."""
    grid = []
    for line in text.strip().splitlines():
        row = [None if w == "?" else int(w) for w in line.split()]
        grid.append(row)
    return grid


def _sudoku_cols(size: int):
    # column ids: 4 constraint families x size^2 each
    # (cell filled, row-digit, column-digit, square-digit) —
    # CellConstraint/RowConstraint/ColumnConstraint/SquareConstraint
    n2 = size * size
    return {
        "cell": lambda r, c: r * size + c,
        "row": lambda r, d: n2 + r * size + (d - 1),
        "col": lambda c, d: 2 * n2 + c * size + (d - 1),
        "sq": lambda s, d: 3 * n2 + s * size + (d - 1),
    }


def solve_sudoku(grid: list[list[int | None]], limit: int = 2):
    """Solve a (generalized) sudoku via exact cover: one row per
    (row, col, digit) candidate, 4 constraint columns each; givens
    simply restrict the candidate set. Returns up to ``limit`` solved
    grids (limit=2 lets callers check uniqueness)."""
    size = len(grid)
    root = int(size ** 0.5)
    assert root * root == size, "size must be a perfect square"
    ids = _sudoku_cols(size)
    rows: list[tuple[int, ...]] = []
    meta: list[tuple[int, int, int]] = []
    for r in range(size):
        for c in range(size):
            digits = [grid[r][c]] if grid[r][c] else range(1, size + 1)
            s = (r // root) * root + (c // root)
            for d in digits:
                rows.append(
                    (ids["cell"](r, c), ids["row"](r, d),
                     ids["col"](c, d), ids["sq"](s, d))
                )
                meta.append((r, c, d))
    cover = ExactCover(rows, 4 * size * size)
    solutions: list[list[list[int]]] = []

    def count(chosen: list[int]) -> bool:
        if not cover.col_rows:
            out = [[0] * size for _ in range(size)]
            for i in chosen:
                r, c, d = meta[i]
                out[r][c] = d
            solutions.append(out)
            return len(solutions) >= limit
        for i in cover.candidates():
            removed = cover._cover(i)
            chosen.append(i)
            done = count(chosen)
            chosen.pop()
            cover._uncover(removed)
            if done:
                return True
        return False

    count([])
    return solutions
