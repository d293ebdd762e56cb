"""Product-quantization ANN (pipeline.similarity train_pq_codebooks
kernel='sequential' + pq_encode + pq_topk) recomputed from scratch as
DuckDB SQL — the PQ sibling of oracle_ivf.py, so the `ann_recall` PQ
legs are a TRUE cross-engine oracle from day one (no pinned
measurements at any point).

Same foundation as the IVF oracle (round 9): every floating-point
reduction in the sequential training kernel is a LEFT FOLD in a fixed
order, the one accumulation order DuckDB ``list_sum``/``list_reduce``,
Spark ``aggregate()`` and plain Python loops implement bit-identically.
The PQ-specific folds this module spells in SQL:

- init: the n_codes corpus rows with the smallest portable 48-bit md5
  rank of ``'{id}#{seed}'``, each unit vector SLICED per subspace
  (codebook[sub][code] = init_row[sub*sd+1 .. (sub+1)*sd]);
- Lloyd assignment: per (vector, sub) argmin of the dim-ordered
  squared-L2 fold ``Σ (u[lo+j]-c[j])²`` — ties to the LOWEST code
  (matching _pq_assign_expr's array_sort by (distance, code));
- Lloyd update: per (sub, code, dim) id-ordered left-fold sums, plain
  means (no normalization — sub-vectors are not unit); empty codes
  keep the previous entry (COALESCE against the prior iteration);
- ADC serving: score = the SUB-ORDERED sum of dim-ordered sub-dot
  folds ``Σ_sub Σ_j q[lo+j]·cb[sub][code][j]`` (``list_sum(list(sd
  ORDER BY sub))`` — a bare SUM() has no order guarantee); candidates
  = ADC top-(k·rerank_factor) per query by (score DESC, vec_id ASC);
  exact cosine re-rank inside (cos DESC, vec_id ASC) — pq_topk
  verbatim.

tests/test_pipeline.py pins the codebooks bit-for-bit Spark-vs-DuckDB,
the same discipline as the IVF centroids.
"""

from __future__ import annotations


def _md5_rank(id_expr: str, seed: int) -> str:
    """curate.hash48 of '{id}#{seed}' in DuckDB (the documented
    recomputation, shared with oracle_ivf)."""
    return (
        f"CAST(('0x' || substring(md5(CAST({id_expr} AS VARCHAR) || '#{seed}'),"
        f" 1, 12)) AS BIGINT)"
    )


def pq_ctes(
    m: int = 2,
    n_codes: int = 4,
    iters: int = 1,
    k: int = 5,
    n_queries: int = 3,
    seed: int = 42,
    dim: int = 64,
    rerank_factor: int = 4,
    unit_cte: str = "u",
) -> str:
    """CTE chain (prefixed ``pq_``) computing the PQ-with-rerank
    approximate top-k rows as ``pq_approx(query_id, vec_id)``. Appends
    to an oracle that already defines ``{unit_cte}(vec_id, u)`` — the
    normalized corpus. Subspaces are equal splits: sub s covers dims
    ``s*sd+1 .. (s+1)*sd`` with sd = dim/m."""
    if dim % m:
        raise ValueError(f"pq_ctes: m ({m}) must divide dim ({dim})")
    sd = dim // m
    subs = ", ".join(f"({s})" for s in range(m))
    parts: list[str] = []
    # --- init: n_codes smallest md5-rank unit vectors, sliced per sub ---
    parts.append(f""",
pq_init AS (
  SELECT ROW_NUMBER() OVER (ORDER BY rk, vec_id) - 1 AS ci, u
  FROM (
    SELECT vec_id, u, {_md5_rank('vec_id', seed)} AS rk
    FROM {unit_cte}
  )
  ORDER BY rk, vec_id LIMIT {n_codes}
),
pq_cb0 AS (
  SELECT s.sub, i.ci,
         list_transform(range(1, {sd} + 1), j -> i.u[s.sub * {sd} + j]) AS c
  FROM pq_init i, (VALUES {subs}) s(sub)
)""")

    def dists(i: int) -> str:
        # dim-ordered squared-L2 fold per (vector, sub, code)
        return f""",
pq_d{i} AS (
  SELECT v.vec_id, cb.sub, cb.ci,
         list_sum(list_transform(range(1, {sd} + 1),
           j -> (v.u[cb.sub * {sd} + j] - cb.c[j])
              * (v.u[cb.sub * {sd} + j] - cb.c[j]))) AS d
  FROM {unit_cte} v, pq_cb{i} cb
)"""

    def asg(i: int) -> str:
        # argmin, ties to the lowest code (matches _pq_assign_expr)
        return f""",
pq_a{i} AS (
  SELECT vec_id, sub, ci AS code FROM (
    SELECT vec_id, sub, ci,
           ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY d ASC, ci ASC) AS rn
    FROM pq_d{i}
  ) WHERE rn = 1
)"""

    for i in range(iters):
        parts.append(dists(i))
        parts.append(asg(i))
        parts.append(f""",
pq_s{i} AS (
  SELECT a.sub, a.code, j AS d,
         list_sum(list(v.u[a.sub * {sd} + j] ORDER BY v.vec_id)) AS s,
         COUNT(*) AS n
  FROM pq_a{i} a JOIN {unit_cte} v USING (vec_id),
       UNNEST(range(1, {sd} + 1)) AS t(j)
  GROUP BY a.sub, a.code, j
),
pq_m{i} AS (
  SELECT sub, code AS ci, list(s / n ORDER BY d) AS mn
  FROM pq_s{i} GROUP BY sub, code
),
pq_cb{i + 1} AS (
  SELECT p.sub, p.ci, COALESCE(mm.mn, p.c) AS c
  FROM pq_cb{i} p LEFT JOIN pq_m{i} mm USING (sub, ci)
)""")

    # --- encode with the final codebooks, ADC-score, rerank ---
    parts.append(dists(iters))
    parts.append(asg(iters))
    parts.append(f""",
pq_sd AS (
  SELECT a.vec_id, qu.vec_id AS query_id, a.sub,
         list_sum(list_transform(range(1, {sd} + 1),
           j -> qu.u[a.sub * {sd} + j] * cb.c[j])) AS sdot
  FROM pq_a{iters} a
  JOIN pq_cb{iters} cb ON cb.sub = a.sub AND cb.ci = a.code
  JOIN {unit_cte} qu ON qu.vec_id < {n_queries}
),
pq_score AS (
  SELECT query_id, vec_id, list_sum(list(sdot ORDER BY sub)) AS score
  FROM pq_sd GROUP BY query_id, vec_id
),
pq_cand AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rn
    FROM pq_score
  ) WHERE rn <= {k * rerank_factor}
),
pq_rr AS (
  SELECT c.query_id, c.vec_id,
         list_sum(list_transform(range(1, {dim} + 1), j -> cu.u[j] * qu.u[j])) AS cos
  FROM pq_cand c
  JOIN {unit_cte} cu ON cu.vec_id = c.vec_id
  JOIN {unit_cte} qu ON qu.vec_id = c.query_id
),
pq_approx AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rn
    FROM pq_rr
  ) WHERE rn <= {k}
)""")
    return "".join(parts)


def pq_codebooks_sql(
    m: int = 2,
    n_codes: int = 4,
    iters: int = 1,
    seed: int = 42,
    dim: int = 64,
    src: str = "embeddings",
) -> str:
    """Standalone statement returning the trained codebooks as
    (sub, ci, c DOUBLE[]) — for the pytest that pins them bit-for-bit
    against the Spark sequential kernel (the IVF centroid pin's PQ
    sibling)."""
    return (
        f"""
WITH pq_v AS (
  SELECT vec_id, embedding AS v FROM {src}
), pq_u AS (
  SELECT vec_id,
         list_transform(v, x -> CAST(x AS DOUBLE)
           / CASE WHEN nrm = 0 THEN 1 ELSE nrm END) AS u
  FROM (
    SELECT vec_id, v,
           sqrt(list_sum(list_transform(v, x -> CAST(x * x AS DOUBLE)))) AS nrm
    FROM pq_v
  )
)"""
        + pq_ctes(
            m, n_codes, iters, k=1, n_queries=0, seed=seed, dim=dim,
            rerank_factor=1, unit_cte="pq_u",
        )
        + f"\nSELECT sub, ci, c FROM pq_cb{iters} ORDER BY sub, ci"
    )
