"""Probabilistic record linkage (Fellegi–Sunter) — entity resolution.

The reference resolves identity EXACTLY: every entity keys on its NEAR
account id (`accounts/models.py:30-38`, upserts via `get_or_create`), so
two records are the same iff their ids match. Real data integration —
merging account records across sources, deduping user profiles before
training — needs the probabilistic generalization: score candidate pairs
by per-field agreement under the Fellegi–Sunter model (JASA 1969) and
classify match / possible / non-match by thresholds.

Model: for field i with agreement probability m_i among true matches and
u_i among non-matches, an AGREEING field contributes log2(m_i/u_i) > 0
and a DISAGREEING field log2((1-m_i)/(1-u_i)) < 0; the pair score is the
sum (log-likelihood ratio under field independence).

Scale shape (the same bounded-cell discipline as the LSH family):
candidate pairs are generated ONLY inside blocking-key cells — the pair
join's shuffle key is the block, and fan-out per cell is bounded by cell
size squared. Production blocking keys must be high-cardinality
quasi-identifiers whose cardinality GROWS with the corpus (zip+birthyear,
name-phonetic+city, ...), keeping cells O(1) as data grows; a
fixed-cardinality key would make pair count quadratic in corpus size.
All scoring is JVM-side column arithmetic: weights are precomputed in
Python, rounded to 6 dp, and summed as DECIMAL(18,6) literals (exact,
association-independent), with one cast to double at the end — the
repo-wide decimal-intermediates/double-outputs policy that makes the
score bit-identical across engines (DuckDB parses decimal literals as
DECIMAL natively; a double-literal sum would differ in the last ulp).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class FieldModel:
    """One comparison field: ``agree(a_col, b_col) -> Column[bool]`` plus
    the Fellegi–Sunter m (P[agree | match]) and u (P[agree | non-match])
    probabilities estimated for it."""

    name: str
    m: float
    u: float

    @property
    def w_agree(self) -> float:
        return round(math.log2(self.m / self.u), 6)

    @property
    def w_disagree(self) -> float:
        return round(math.log2((1.0 - self.m) / (1.0 - self.u)), 6)


def blocked_pairs(
    df: DataFrame, id_col: str, block_cols: list[str]
) -> DataFrame:
    """Candidate pairs (a < b by id) meeting inside blocking cells.
    Every non-key column comes back twice, suffixed `_a` / `_b`. The
    join shuffles on the block key only — pair fan-out is bounded per
    cell, never corpus-wide."""
    val_cols = [c for c in df.columns if c not in block_cols and c != id_col]
    # suffixing must not collide with existing names ('x' next to 'x_a'
    # would alias two columns to the same output name and break the join
    # silently-downstream); fail loudly instead
    out_names = {f"{c}_a" for c in val_cols} | {f"{c}_b" for c in val_cols}
    clash = out_names & set(df.columns)
    if clash or "id_a" in df.columns or "id_b" in df.columns:
        raise ValueError(
            f"blocked_pairs suffix collision with input columns: "
            f"{sorted(clash | ({'id_a', 'id_b'} & set(df.columns)))}"
        )
    a = df.select(
        *block_cols,
        F.col(id_col).alias("id_a"),
        *[F.col(c).alias(f"{c}_a") for c in val_cols],
    )
    b = df.select(
        *block_cols,
        F.col(id_col).alias("id_b"),
        *[F.col(c).alias(f"{c}_b") for c in val_cols],
    )
    return a.join(b, block_cols).filter(F.col("id_a") < F.col("id_b"))


def fellegi_sunter_scores(
    pairs: DataFrame,
    fields: list[tuple[FieldModel, Column]],
    upper: float,
    lower: float,
) -> DataFrame:
    """Score blocked pairs: per-field agreement flag + literal-weight
    log-likelihood sum + three-way decision. ``fields`` couples each
    FieldModel with its agreement predicate over the `_a`/`_b` columns.
    Weights are 6-dp decimals summed exactly as DECIMAL(18,6); the final
    score casts to double once (cross-engine exact — see module doc)."""
    out = pairs
    score: Column | None = None
    for fm, agree in fields:
        flag = F.when(agree, F.lit(True)).otherwise(F.lit(False))
        out = out.withColumn(f"agree_{fm.name}", flag)
        term = F.when(
            F.col(f"agree_{fm.name}"),
            F.lit(str(fm.w_agree)).cast("decimal(18,6)"),
        ).otherwise(F.lit(str(fm.w_disagree)).cast("decimal(18,6)"))
        score = term if score is None else score + term
    out = out.withColumn("score", score.cast("double"))
    return out.withColumn(
        "decision",
        F.when(F.col("score") >= F.lit(upper), F.lit("match"))
        .when(F.col("score") >= F.lit(lower), F.lit("possible"))
        .otherwise(F.lit("non_match")),
    )
