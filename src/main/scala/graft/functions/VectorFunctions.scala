package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector primitives over `array<float>` embedding columns (SURVEY §2.3
  * E39-E40).
  *
  * Elements are cast to double before arithmetic so Spark and the DuckDB
  * oracle both run IEEE-double left-to-right folds — bit-identical until a
  * final `round` makes the comparison robust anyway. Composed from
  * `zip_with`/`aggregate` higher-order functions (codegen'd, per-row,
  * no shuffle); if BENCH shows these hot, the promotion path is a native
  * Catalyst Expression (SURVEY §7.2).
  */
object VectorFunctions {

  private def d(c: Column): Column = transform(c, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity, rounded to 6 decimals (cross-engine float safety). */
  def cosine(a: Column, b: Column): Column =
    round(dot(a, b) / (norm(a) * norm(b)), 6)

  def l2Distance(a: Column, b: Column): Column =
    round(
      sqrt(aggregate(zip_with(d(a), d(b), (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x)),
      6)

  /** Sign-random-projection LSH bucket id over `nBits` deterministic
    * hyperplanes. Hyperplane j weight for dimension i is
    * `((j*64 + i)*2654435761 mod 97) - 48` — a fixed pseudo-random integer
    * grid both engines can restate. Bucket = Σ_j bit_j·2^j where bit_j = 1
    * iff Σ_i w_ji·v_i >= 0.
    *
    * This is the scale path for similarity search: group vectors by bucket
    * and only compare within a bucket (plus optionally neighboring buckets),
    * turning the O(n²) cross join into bucket-local joins.
    */
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
