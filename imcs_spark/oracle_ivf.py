"""The engine's IVF-ANN training + serving (pipeline.similarity,
kernel='sequential') recomputed from scratch as DuckDB SQL, so the
`ann_recall` IVF legs can be a TRUE cross-engine oracle instead of a
pinned measurement — closing the last pinned oracle in the registry
(round 9; the LSH legs crossed over in round 5).

Why this is possible at all: floating-point summation is order-
sensitive, so a numpy-partial-sum Lloyd step is NOT SQL-reproducible
(the round-5..8 impossibility note). The round-9 probe showed that a
SEQUENTIAL LEFT FOLD over doubles is bit-identical across all three
engines — DuckDB's ``list_sum`` / ``list_reduce``, Spark's
``aggregate()`` HOF, and a plain Python accumulation loop produce the
same bits on adversarial mixed-magnitude inputs. So the sequential
training kernel (similarity._train_ivf_sequential) defines every
reduction as a left fold in a fixed order, and this module spells the
identical folds in SQL:

- unit vectors: ``sqrt(list_sum(x*x))`` over dims in order (the same
  ``u`` CTE convention the LSH legs already use — float*float
  multiplied at FLOAT precision then widened, matching Spark's
  ``(x * x).cast('double')``);
- init: the K corpus rows with the smallest portable 48-bit md5 rank
  of ``'{id}#{seed}'`` (curate.hash48 — the engine-wide hash-order
  convention sampling and splitting already share with the oracles);
- Lloyd assignment: argmax of the dim-ordered dot-product fold, ties
  to the lowest cell (matching _sim_cells' sort-by-(s, -cell));
- Lloyd update: per (cell, dim) sums as ``list_sum(list(x ORDER BY
  vec_id))`` — the id-ordered left fold the Spark kernel builds with
  ``aggregate(array_sort(collect_list(struct(id, x))))``;
- centroid normalization: mean = s/n per dim, then a dim-ordered
  fold of squares, ``sqrt``, divide (zero-norm -> 1.0); empty cells
  keep the previous centroid (COALESCE against the prior iteration);
- serving: corpus assigned to final-centroid cells, each query probes
  its n_probe nearest cells (cos DESC, cell ASC), exact cosine
  re-rank inside (cos DESC, vec_id ASC) — ivf_topk verbatim.

The result: centroids, assignments, and the recall integers are all
recomputed from first principles on both engines and compared by the
driver every round. tests/test_pipeline.py pins the centroid arrays
bit-for-bit Spark-vs-DuckDB.
"""

from __future__ import annotations


def _md5_rank(id_expr: str, seed: int) -> str:
    """curate.hash48 of '{id}#{seed}' in DuckDB (the documented
    recomputation, curate.py:123-131)."""
    return (
        f"CAST(('0x' || substring(md5(CAST({id_expr} AS VARCHAR) || '#{seed}'),"
        f" 1, 12)) AS BIGINT)"
    )


def ivf_ctes(
    n_centroids: int = 8,
    iters: int = 1,
    n_probe: int = 3,
    k: int = 5,
    n_queries: int = 3,
    seed: int = 42,
    dim: int = 64,
    unit_cte: str = "u",
) -> str:
    """CTE chain (prefixed ``iv_``) computing the IVF approximate
    top-k rows as ``iv_approx(query_id, vec_id)``. Appends to an
    oracle that already defines ``{unit_cte}(vec_id, u)`` — the
    normalized corpus (the ann_recall oracle's ``u``). Emits one
    assignment+update block per Lloyd iteration, then the serving
    chain against the final centroids."""
    parts: list[str] = []
    # --- init: K smallest md5-rank unit vectors, ci = rank order ---
    parts.append(f""",
iv_cen0 AS (
  SELECT ROW_NUMBER() OVER (ORDER BY rk, vec_id) - 1 AS ci, u AS c
  FROM (
    SELECT vec_id, u, {_md5_rank('vec_id', seed)} AS rk
    FROM {unit_cte}
  )
  ORDER BY rk, vec_id LIMIT {n_centroids}
)""")

    def dots(i: int, cen: str) -> str:
        # dim-ordered dot fold: u[j] * c[j], summed 1..dim — the same
        # sequential fold _dot_lit_sql builds (aggregate over zip_with)
        return f""",
iv_dots{i} AS (
  SELECT v.vec_id, c.ci,
         list_sum(list_transform(range(1, {dim} + 1), j -> v.u[j] * c.c[j])) AS d
  FROM {unit_cte} v, {cen} c
)"""

    def asg(i: int) -> str:
        # argmax, ties to the lowest cell (matches _sim_cells)
        return f""",
iv_asg{i} AS (
  SELECT vec_id, ci AS cell FROM (
    SELECT vec_id, ci,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d DESC, ci ASC) AS rn
    FROM iv_dots{i}
  ) WHERE rn = 1
)"""

    for i in range(iters):
        parts.append(dots(i, f"iv_cen{i}"))
        parts.append(asg(i))
        # id-ordered left-fold sums per (cell, dim), then normalized
        # means; empty cells keep the previous centroid
        parts.append(f""",
iv_sum{i} AS (
  SELECT a.cell, j AS d,
         list_sum(list(v.u[j] ORDER BY v.vec_id)) AS s,
         COUNT(*) AS n
  FROM iv_asg{i} a JOIN {unit_cte} v USING (vec_id),
       UNNEST(range(1, {dim} + 1)) AS t(j)
  GROUP BY a.cell, j
),
iv_mean{i} AS (
  SELECT cell AS ci, list(s / n ORDER BY d) AS m FROM iv_sum{i} GROUP BY cell
),
iv_cen{i + 1} AS (
  SELECT p.ci,
         COALESCE(
           list_transform(mm.m, x -> x / CASE WHEN mm.nrm = 0 THEN 1 ELSE mm.nrm END),
           p.c) AS c
  FROM iv_cen{i} p LEFT JOIN (
    SELECT ci, m, sqrt(list_sum(list_transform(m, x -> x * x))) AS nrm
    FROM iv_mean{i}
  ) mm USING (ci)
)""")

    # --- serving: assign corpus to FINAL cells, probe, re-rank ---
    parts.append(dots(iters, f"iv_cen{iters}"))
    parts.append(asg(iters))
    parts.append(f""",
iv_probe AS (
  SELECT vec_id AS query_id, ci AS cell FROM (
    SELECT vec_id, ci,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d DESC, ci ASC) AS rn
    FROM iv_dots{iters} WHERE vec_id < {n_queries}
  ) WHERE rn <= {n_probe}
),
iv_cand AS (
  SELECT p.query_id, a.vec_id,
         list_sum(list_transform(range(1, {dim} + 1), j -> cu.u[j] * qu.u[j])) AS cos
  FROM iv_probe p
  JOIN iv_asg{iters} a ON a.cell = p.cell
  JOIN {unit_cte} cu ON cu.vec_id = a.vec_id
  JOIN {unit_cte} qu ON qu.vec_id = p.query_id
),
iv_approx AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rn
    FROM iv_cand
  ) WHERE rn <= {k}
)""")
    return "".join(parts)


def ivf_centroids_sql(
    n_centroids: int = 8,
    iters: int = 1,
    seed: int = 42,
    dim: int = 64,
    src: str = "embeddings",
) -> str:
    """Standalone statement returning the trained centroids as
    (ci, c DOUBLE[]) — for the pytest that pins them bit-for-bit
    against the Spark sequential kernel."""
    return (
        f"""
WITH iv_v AS (
  SELECT vec_id, embedding AS v FROM {src}
), iv_u AS (
  SELECT vec_id,
         list_transform(v, x -> CAST(x AS DOUBLE)
           / CASE WHEN nrm = 0 THEN 1 ELSE nrm END) AS u
  FROM (
    SELECT vec_id, v,
           sqrt(list_sum(list_transform(v, x -> CAST(x * x AS DOUBLE)))) AS nrm
    FROM iv_v
  )
)"""
        + ivf_ctes(
            n_centroids, iters, n_probe=1, k=1, n_queries=0,
            seed=seed, dim=dim, unit_cte="iv_u",
        )
        + f"\nSELECT ci, c FROM iv_cen{iters} ORDER BY ci"
    )
