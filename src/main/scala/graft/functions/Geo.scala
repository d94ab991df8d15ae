package graft.functions

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Geo-fence support: point-in-polygon over GeoJSON fences
  * (reference behavior: wrangler-core io.cdap.functions.GeoFences —
  * InFence(lat, lon, geojson)). Ray-casting implementation; the GeoJSON
  * subset parsed is Polygon / MultiPolygon / Feature(Collection)
  * coordinate arrays.
  */
object Geo {

  /** Ray-casting point-in-polygon; ring = [[lon,lat], …]. */
  def inRing(lat: Double, lon: Double, ring: Seq[(Double, Double)]): Boolean = {
    var inside = false
    var j = ring.size - 1
    var i = 0
    while (i < ring.size) {
      val (xi, yi) = ring(i)
      val (xj, yj) = ring(j)
      if (((yi > lat) != (yj > lat)) &&
        (lon < (xj - xi) * (lat - yi) / (yj - yi) + xi)) inside = !inside
      j = i
      i += 1
    }
    inside
  }

  /** Extract polygon rings from a GeoJSON string (coordinate triples of
    * nesting: Polygon = [ring…], MultiPolygon = [[ring…]…]).
    */
  private[functions] def rings(geojson: String): Seq[Seq[(Double, Double)]] = {
    // bracket-depth scanner: for each "coordinates" key, capture its
    // balanced [...] block, then collect rings = innermost pair lists
    val out = scala.collection.mutable.ArrayBuffer.empty[Seq[(Double, Double)]]
    var from = geojson.indexOf("\"coordinates\"")
    while (from >= 0) {
      val open = geojson.indexOf('[', from)
      if (open < 0) return out.toSeq
      var depth = 0
      var i = open
      var end = -1
      while (i < geojson.length && end < 0) {
        geojson.charAt(i) match {
          case '[' => depth += 1
          case ']' => depth -= 1; if (depth == 0) end = i
          case _ =>
        }
        i += 1
      }
      if (end < 0) return out.toSeq
      val block = geojson.substring(open, end + 1)
      // a ring is a "[[x,y],[x,y],…]" group: find bracket groups whose
      // direct children are coordinate pairs
      val pairRe = java.util.regex.Pattern.compile(
        "\\[\\s*(-?\\d+(?:\\.\\d+)?(?:[eE][+-]?\\d+)?)\\s*,\\s*(-?\\d+(?:\\.\\d+)?(?:[eE][+-]?\\d+)?)\\s*\\]")
      val ring = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
      val pm = pairRe.matcher(block)
      var lastEnd = -10
      while (pm.find()) {
        // a gap containing "]" between pairs = ring boundary
        val gap = block.substring(math.max(lastEnd, 0), pm.start())
        if (lastEnd > 0 && gap.contains("]")) {
          if (ring.size >= 3) out += ring.toSeq
          ring.clear()
        }
        ring += ((pm.group(1).toDouble, pm.group(2).toDouble))
        lastEnd = pm.end()
      }
      if (ring.size >= 3) out += ring.toSeq
      from = geojson.indexOf("\"coordinates\"", end)
    }
    out.toSeq
  }

  def inFence(lat: java.lang.Double, lon: java.lang.Double,
      geojson: String): java.lang.Boolean = {
    if (lat == null || lon == null || geojson == null) return null
    java.lang.Boolean.valueOf(
      rings(geojson).exists(r => inRing(lat, lon, r)))
  }

  val inFenceUdf: UserDefinedFunction = udf(inFence _)
}
