package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, EqualTo, Literal, XxHash64}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.DataType
import org.apache.spark.util.sketch.BloomFilter

/** Explicit bloom-filter join prefilter (SURVEY §2.3 E79) — the runtime-
  * filter pattern for "large fact ⋈ selective dim" when the dim side is too
  * big (or too late-bound) to broadcast as rows but its KEY SET compresses
  * into a few megabytes of bitmap.
  *
  * Why it matters at 100 TB: a shuffled join materializes and redistributes
  * EVERY fact row, matching or not. Prefiltering against the dim's bloom
  * filter drops non-matching fact rows at the scan — before the exchange —
  * so the shuffle carries only (matches + fpp·non-matches). With a 1%-
  * selective dim and fpp=1%, that is ~50× less shuffled data for the price
  * of a broadcast bitmap (~1.2 MB per million keys at 1% fpp). Bloom
  * filters have no false negatives, so the subsequent real join makes the
  * result exact; false positives only cost wasted shuffle rows.
  *
  * Both halves are Spark's OWN runtime-filter machinery, driven explicitly:
  * the filter is built by the `BloomFilterAggregate` Catalyst aggregate
  * (distributed partials, map-side combine — not a driver-side RDD fold)
  * and the probe is `BloomFilterMightContain`, a codegen'd native
  * predicate. The probe therefore stays INSIDE whole-stage codegen on the
  * fact scan — the earlier Scala-UDF probe broke the scan's codegen span —
  * and both sides hash with the same `XxHash64`, the invariant Spark's own
  * `InjectRuntimeFilter` relies on. Spark's automatic injection
  * (`spark.sql.optimizer.runtime.bloomFilter.*`) only triggers on
  * statistics it can see; this operator is the explicit, always-available
  * form.
  *
  * Key typing: the filter accepts ANY key type — `XxHash64` hashes every
  * Catalyst type. But the hash is physical-type-sensitive
  * (`xxhash64(5: int) ≠ xxhash64(5L)`), so when the fact and dim key types
  * differ BOTH sides are cast to the comparison type the equi-join itself
  * coerces to — read off the ANALYZED join condition, see [[joinKeyType]] —
  * which is exactly the invariant that guarantees "equal after join
  * coercion ⇒ equal hash ⇒ no false negatives". (Two earlier revisions got
  * this wrong in two directions: casting every key to `long` NULLed string
  * keys, and `findWiderTypeForTwo` widened string-vs-numeric pairs to
  * string while the join compares them numerically; BloomOpsSpec pins both
  * cases.)
  *
  * NULL semantics: a bloom filter holds key values, and SQL equi-joins
  * never match on NULL, so NULL dim keys are excluded from the build and
  * NULL fact keys are dropped by the probe (`key IS NOT NULL AND
  * might_contain(...)`). Without the explicit guards, `XxHash64` would
  * pass NULLs through as the seed value and a NULL fact key would "match"
  * a NULL dim key — a row the exact join would never produce.
  */
object BloomOps {

  private val MaxItemsConf = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
  private val MaxBitsConf = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"

  /** Serializes the temporary session-conf raise in [[buildFilter]]: the
    * limits live in SHARED session conf, and concurrent builds on one
    * session (GraftApp runs tables at parallelism 4) could interleave
    * set/restore — silently clamping one build's size (degraded fpp) or
    * leaving a raised limit behind. The build's action runs under the
    * lock; bloom builds are rare one-row aggregates, so the serialization
    * cost is noise. */
  private val buildLock = new Object

  /** The type the equi-join itself coerces both keys to before comparing.
    * Hashing after a cast to THIS type is the invariant that guarantees
    * "equal after join coercion ⇒ equal hash ⇒ no false negatives".
    *
    * Derived by ANALYZING the join this prefilter fronts and reading the
    * coerced comparison type off its condition — not recomputed from a
    * coercion table. An earlier revision used `findWiderTypeForTwo`, which
    * widens string-vs-numeric pairs to STRING while the join's
    * binary-comparison rule coerces them to a NUMERIC type: a fact 5.0d
    * joined to a dim '5' matches in the exact join but hashed as "5.0" vs
    * "5" in the filter — a false negative that silently dropped rows.
    * Asking the analyzer makes the filter track whatever rule the session
    * actually runs (ANSI or legacy) by construction. */
  private def joinKeyType(fact: DataFrame, factKey: String, dim: DataFrame, dimKey: String): DataType = {
    val ft = fact.schema(factKey).dataType
    val dt = dim.schema(dimKey).dataType
    if (ft == dt) ft
    else {
      val analyzed =
        try fact.join(dim, fact.col(factKey) === dim.col(dimKey)).queryExecution.analyzed
        catch {
          case e: org.apache.spark.sql.AnalysisException =>
            throw new IllegalArgumentException(
              s"bloom prefilter keys are not joinable: $factKey is $ft, $dimKey is $dt", e)
        }
      analyzed
        .collect { case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
        .flatMap(_.condition.toSeq)
        .flatMap(_.collect { case eq: EqualTo => eq.left.dataType })
        .headOption
        .getOrElse(throw new IllegalArgumentException(
          s"bloom prefilter keys are not joinable: $factKey is $ft, $dimKey is $dt " +
            "(the analyzed join has no coerced equality on them)"))
    }
  }

  /** The dim side's key set as a serialized bloom filter (one distributed
    * aggregate; partials merge map-side). NULL keys are excluded — the
    * exact join can never match them. `BloomFilterAggregate` silently
    * clamps its size to the session's runtime-filter limits (4M items /
    * 64M bits by default), which would degrade the realized fpp for dims
    * beyond ~4M keys, so the limits are raised for the build when
    * `expectedItems` needs it and restored after. */
  private def buildFilter(
      dim: DataFrame,
      dimKey: String,
      keyType: DataType,
      expectedItems: Long,
      fpp: Double): Array[Byte] = {
    val numBits = BloomFilter.optimalNumOfBits(expectedItems, fpp)
    val hashed = new XxHash64(Seq(ColumnBridge.expression(col(dimKey).cast(keyType))))
    val agg = new BloomFilterAggregate(hashed, Literal(expectedItems), Literal(numBits))
      .toAggregateExpression()
    val conf = dim.sparkSession.conf
    buildLock.synchronized {
      val (prevItems, prevBits) = (conf.get(MaxItemsConf), conf.get(MaxBitsConf))
      try {
        if (expectedItems > prevItems.toLong) conf.set(MaxItemsConf, expectedItems.toString)
        if (numBits > prevBits.toLong) conf.set(MaxBitsConf, numBits.toString)
        dim.filter(col(dimKey).isNotNull)
          .select(ColumnBridge.column(agg).as("bf")).head().getAs[Array[Byte]](0)
      } finally {
        conf.set(MaxItemsConf, prevItems)
        conf.set(MaxBitsConf, prevBits)
      }
    }
  }

  /** `fact` reduced to rows whose `factKey` is PROBABLY in `dim.dimKey`
    * (no false negatives; ≈`fpp` false positives). The predicate is the
    * native `might_contain` — codegen'd, so the fact scan's whole-stage
    * span survives. NULL fact keys never match (SQL join semantics). */
  def bloomSemiFilter(
      fact: DataFrame,
      factKey: String,
      dim: DataFrame,
      dimKey: String,
      expectedItems: Long,
      fpp: Double = 0.01): DataFrame = {
    val keyType = joinKeyType(fact, factKey, dim, dimKey)
    val bytes = buildFilter(dim, dimKey, keyType, expectedItems, fpp)
    val probe = BloomFilterMightContain(
      Literal(bytes),
      new XxHash64(Seq(ColumnBridge.expression(col(factKey).cast(keyType)))))
    fact.filter(col(factKey).isNotNull && ColumnBridge.column(probe))
  }

  /** Exact inner join with the bloom prefilter applied to the fact side
    * first. Equivalent to `fact.join(dim, fact(factKey) === dim(dimKey))`,
    * shuffling only the prefiltered fact. */
  def bloomJoin(
      fact: DataFrame,
      factKey: String,
      dim: DataFrame,
      dimKey: String,
      expectedItems: Long,
      fpp: Double = 0.01): DataFrame =
    bloomSemiFilter(fact, factKey, dim, dimKey, expectedItems, fpp)
      .join(dim, col(factKey) === col(dimKey))
}
