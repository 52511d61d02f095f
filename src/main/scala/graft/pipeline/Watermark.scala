package graft.pipeline

import java.sql.Timestamp
import java.time.format.DateTimeFormatter
import java.time.{LocalDateTime, ZoneOffset}
import scala.util.Try

/** Typed watermark scalar.
  *
  * The reference keeps watermarks stringly-typed end-to-end
  * (`/root/reference/app.py:111`, `dags/...:76`); we type them (SURVEY §7.3
  * hazard 4) and serialize ISO-8601 UTC in state.
  */
sealed trait WatermarkValue {
  def serialized: String
}
object WatermarkValue {
  final case class IdValue(v: Long) extends WatermarkValue {
    def serialized: String = v.toString
  }
  final case class TsValue(v: Timestamp) extends WatermarkValue {
    def serialized: String =
      v.toLocalDateTime.atOffset(ZoneOffset.UTC).format(Fmt)
  }
  private val Fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")

  /** Decode a stored/env value per the reference's rules
    * (`/root/reference/app.py:96-132`): `None`/empty/`'none'` → absent →
    * full load; id parses as long, cast failure → full load; timestamp
    * parsed (the reference passes the string verbatim into SQL,
    * `/root/reference/app.py:111`).
    */
  def decode(raw: Option[String], tpe: WatermarkType): Option[WatermarkValue] =
    raw.map(_.trim).filter(s => s.nonEmpty && !s.equalsIgnoreCase("none")).flatMap { s =>
      tpe match {
        case WatermarkType.Id => Try(IdValue(s.toLong)).toOption
        case WatermarkType.Timestamp =>
          Try(TsValue(Timestamp.valueOf(s))).orElse(
            Try(TsValue(Timestamp.valueOf(LocalDateTime.parse(s))))).toOption
      }
    }
}
