package graft.functions

import graft.plans.{CosineSimExpr, DotProductExpr, L2DistExpr, PqEncodeGen, PqLutGen, SrpBucketExpr}
import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.functions._

/** Vector primitives over `array<float>` embedding columns (SURVEY §2.3
  * E39-E40).
  *
  * Backed by the native Catalyst expressions in [[graft.plans]] — promoted
  * from `zip_with`/`aggregate` HOF compositions after BENCH showed the
  * interpreted lambda evaluation dominating the similarity queries (the
  * HOF forms are kept in [[hof]] for parity testing). Same left-to-right
  * IEEE-double folds, so results are bit-identical to the HOF versions and
  * the DuckDB oracle before the 6-dp rounding.
  */
object VectorFunctions {

  private def expr(c: Column) = ColumnBridge.expression(c)
  private def col(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    ColumnBridge.column(e)

  def dot(a: Column, b: Column): Column = col(DotProductExpr(expr(a), expr(b)))

  /** Cosine similarity, rounded to 6 decimals (cross-engine float safety). */
  def cosine(a: Column, b: Column): Column =
    round(col(CosineSimExpr(expr(a), expr(b))), 6)

  def l2Distance(a: Column, b: Column): Column =
    round(col(L2DistExpr(expr(a), expr(b))), 6)

  /** PQ literal-path generators (round 17) — see
    * [[graft.plans.PqEncodeGen]]/[[graft.plans.PqLutGen]]. */
  def pqEncodeGen(v: Column, books: Array[Array[Array[Double]]],
      withSubvec: Boolean): Column =
    col(PqEncodeGen(expr(v), books, withSubvec))

  /** splitHotCells literal-path packed arg-min (round 17) — see
    * [[graft.plans.SplitAssignExpr]]. */
  def splitAssign(cell: Column, v: Column, cells: Array[Int],
      cents: Array[Array[Array[Double]]], ids: Array[Array[Int]]): Column =
    col(graft.plans.SplitAssignExpr(expr(cell), expr(v), cells, cents, ids))

  def pqLutGen(v: Column, books: Array[Array[Array[Double]]]): Column =
    col(PqLutGen(expr(v), books))

  /** Sign-random-projection LSH bucket id over `nBits` deterministic
    * hyperplanes; see [[graft.plans.VecOps.srpBucket]] for the grid. This
    * is the scale path for similarity search: group vectors by bucket and
    * only compare within a bucket, turning the O(n²) cross join into
    * bucket-local joins.
    *
    * ==Sizing `nBits` at corpus scale==
    * Bucket-local work is quadratic in occupancy, so the knob that matters
    * is expected occupancy ≈ n / 2^nBits. Keep it in the 10³–10⁵ range:
    * big enough that true neighbors still collide, small enough that the
    * per-bucket pair count (occupancy²) stays join-able. Rules of thumb
    * (uniform vectors; skewed data needs +1–2 bits or a bucket cap like
    * LshOps'):
    *   - 10⁶ vectors → 8–10 bits (occupancy ~10³)
    *   - 10⁹ vectors → 16–20 bits (occupancy ~10³–10⁴)
    *   - 10¹² vectors (100 TB of 64-dim floats) → 26–30 bits
    * Each +1 bit halves occupancy (≈4× less bucket work) but lowers recall
    * for a fixed similarity threshold; recover recall by probing multiple
    * bucket permutations (the standard multi-probe trade) rather than
    * dropping bits. */
  def srpBucket(v: Column, nBits: Int): Column = col(SrpBucketExpr(expr(v), nBits))

  /** One BAND of a banded SRP construction: the ≤60-bit bucket over planes
    * `planeOffset .. planeOffset + nBits - 1`. Bit r equals plane
    * `planeOffset + r`, i.e. exactly what
    * `(srpBucket(v, planeOffset + nBits) >> planeOffset) & (2^nBits - 1)`
    * would give — but each band owns its own long, so a banded signature
    * is NOT capped at 60 total bits (the round-6 SrpOps construction was,
    * which is what forced srpAuto's refusal cliff at ~786 k vectors). */
  def srpBand(v: Column, nBits: Int, planeOffset: Int): Column =
    col(SrpBucketExpr(expr(v), nBits, planeOffset))

  /** Reference HOF implementations (interpreted; used by parity tests). */
  object hof {
    private def d(c: Column): Column = transform(c, x => x.cast("double"))

    def dot(a: Column, b: Column): Column =
      aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

    def norm(a: Column): Column = sqrt(dot(a, a))

    def cosine(a: Column, b: Column): Column =
      round(dot(a, b) / (norm(a) * norm(b)), 6)

    def srpBucket(v: Column, nBits: Int, dim: Int): Column =
      aggregate(
        sequence(lit(0), lit(nBits - 1)),
        lit(0L),
        (acc, j) => {
          val proj = aggregate(
            sequence(lit(0), lit(dim - 1)),
            lit(0.0),
            (s, i) => {
              val w = pmod((j * lit(64L) + i.cast("long")) * lit(2654435761L), lit(97L)) - lit(48L)
              s + w.cast("double") * element_at(v, i + 1).cast("double")
            })
          acc + when(proj >= 0, floor(pow(lit(2.0), j)).cast("long")).otherwise(lit(0L))
        })
  }
}
