package graft.pipeline

import java.sql.Timestamp
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Watermark decode parity with `/root/reference/app.py:96-132`, plus
  * property-style round-trip checks (scalacheck Gens sampled with a fixed
  * seed — scalatestplus isn't on the classpath). */
class WatermarkSpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int = 200): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("None/empty/'none' mean absent → full load (app.py:103)") {
    for (raw <- Seq(None, Some(""), Some("  "), Some("none"), Some("None"), Some("NONE")))
      assert(WatermarkValue.decode(raw, WatermarkType.Id).isEmpty, s"raw=$raw")
  }

  test("id watermark parses as Long; cast failure degrades to full load (app.py:106,113-122)") {
    assert(WatermarkValue.decode(Some("42"), WatermarkType.Id)
      .contains(WatermarkValue.IdValue(42L)))
    assert(WatermarkValue.decode(Some("not_a_number"), WatermarkType.Id).isEmpty)
    assert(WatermarkValue.decode(Some("12.5"), WatermarkType.Id).isEmpty)
  }

  test("timestamp watermark parses SQL and ISO forms; garbage degrades") {
    val t = WatermarkValue.decode(Some("2024-01-02 03:04:05.123456"), WatermarkType.Timestamp)
    assert(t.contains(WatermarkValue.TsValue(Timestamp.valueOf("2024-01-02 03:04:05.123456"))))
    assert(WatermarkValue.decode(Some("2024-01-02T03:04:05"), WatermarkType.Timestamp).isDefined)
    assert(WatermarkValue.decode(Some("yesterday"), WatermarkType.Timestamp).isEmpty)
  }

  test("id serialization round-trips for arbitrary longs") {
    for (v <- samples(Gen.chooseNum(Long.MinValue, Long.MaxValue))) {
      val enc = WatermarkValue.IdValue(v).serialized
      assert(WatermarkValue.decode(Some(enc), WatermarkType.Id)
        .contains(WatermarkValue.IdValue(v)), s"v=$v enc=$enc")
    }
  }

  test("timestamp serialization round-trips at microsecond precision") {
    for (ms <- samples(Gen.chooseNum(0L, 4102444800000L))) {
      val ts = new Timestamp(ms)
      ts.setNanos(((ms % 1000) * 1000000 + 123000).toInt) // sub-ms component
      val enc = WatermarkValue.TsValue(ts).serialized
      assert(WatermarkValue.decode(Some(enc), WatermarkType.Timestamp)
        .contains(WatermarkValue.TsValue(ts)), s"ts=$ts enc=$enc")
    }
  }
}
