package graft.ops

import graft.core.GeoqException
import graft.geom._

/** `geoq whereami` twin (reference `commands/whereami.rs:6-45`) with the
  * NETWORK TRANSPORT INJECTED: the reference GETs `http://ip-api.com/json`
  * and converts the response body; this engine has no network access (and
  * the side effect is SURVEY-excluded), so the body arrives via the
  * `GEOQ_IP_JSON` env var or stdin and the ENTIRE decode → validate →
  * format → error contract is the reference's:
  *
  *   - unparseable body → `IPGeolocationError` (the
  *     `serde_json::from_str` error arm — GeoqException, non-zero exit);
  *   - parseable JSON whose `lat`/`lon` are not BOTH f64-coercible
  *     numbers (serde `as_f64` semantics: ints and floats yes, numeric
  *     STRINGS no — stricter than json-munge's heuristic 1) →
  *     `Invalid IP location response: <json>` on stderr with the
  *     canonical compact serialization (serde_json's default Value map is
  *     a BTreeMap — alphabetical keys, same as this engine's writer) and
  *     a ZERO exit (the reference returns `Ok(())` on this arm);
  *   - otherwise → the GeoJSON GEOMETRY of `Point(lon, lat)` on stdout,
  *     canonical serde_json form (the same writer as `gj geom`, whose
  *     golden parity is locked by the cli_test.rs replays).
  */
object WhereAmI {

  /** Right(stdout line) | Left(stderr line); throws GeoqException on the
    * unparseable-body arm. */
  def fromResponse(body: String): Either[String, String] = {
    val v =
      try Json.parse(body)
      catch { case _: Exception => throw GeoqException("IPGeolocationError") }
    // serde_json's `json["lat"]` indexes null for non-objects; `as_f64`
    // accepts i64/u64/f64 values only
    def num(k: String): Option[Double] = v match {
      case JObject(fields) => fields.get(k) match {
        case Some(JLong(l))   => Some(l.toDouble)
        case Some(JDouble(d)) => Some(d)
        case _                => None
      }
      case _ => None
    }
    (num("lat"), num("lon")) match {
      case (Some(lat), Some(lon)) => Right(Geo.geometryJsonString(Geo.point(lon, lat)))
      case _ => Left(s"Invalid IP location response: ${Json.write(v)}")
    }
  }
}
