package graft.geo

/** MGRS (Military Grid Reference System) tile → geographic coordinates,
  * pure Scala, standard public formulas (Snyder's Transverse Mercator
  * series / USGS conventions).
  *
  * The reference resolves HLS tile ids like "60WWV" to their lat/lon
  * centroid for spatial sorting (reference: write.py:36, 62-90). HLS
  * tiles are 5-character MGRS ids: UTM zone (2 digits), latitude band
  * letter, and a 100 km grid-square column+row letter pair.
  */
object Mgrs {

  private val ColSets = Array("ABCDEFGH", "JKLMNPQR", "STUVWXYZ")
  private val RowSetOdd = "ABCDEFGHJKLMNPQRSTUV"
  private val RowSetEven = "FGHJKLMNPQRSTUVABCDE"
  private val LatBands = "CDEFGHJKLMNPQRSTUVWX" // -80° .. 72°, 8° steps

  // WGS84
  private val A = 6378137.0
  private val F = 1.0 / 298.257223563
  private val K0 = 0.9996
  private val E2 = F * (2 - F)
  private val E2p = E2 / (1 - E2)
  private val FalseEasting = 500000.0
  private val FalseNorthingSouth = 10000000.0

  final case class LatLon(lat: Double, lon: Double)

  /** Meridional arc length from equator to latitude (radians). */
  private def meridionalArc(latRad: Double): Double = {
    val e4 = E2 * E2
    val e6 = e4 * E2
    A * ((1 - E2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * latRad
      - (3 * E2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * math.sin(2 * latRad)
      + (15 * e4 / 256 + 45 * e6 / 1024) * math.sin(4 * latRad)
      - (35 * e6 / 3072) * math.sin(6 * latRad))
  }

  /** Geographic → UTM for a given zone (standard forward Transverse
    * Mercator series). Returns (easting, northing-from-equator;
    * negative south).
    */
  def latLonToUtm(lat: Double, lon: Double, zone: Int): (Double, Double) = {
    val latR = math.toRadians(lat)
    val lonR = math.toRadians(lon)
    val lon0 = math.toRadians(zone * 6.0 - 183.0)
    val sinLat = math.sin(latR)
    val cosLat = math.cos(latR)
    val tanLat = math.tan(latR)
    val n = A / math.sqrt(1 - E2 * sinLat * sinLat)
    val t = tanLat * tanLat
    val c = E2p * cosLat * cosLat
    val aa = cosLat * (lonR - lon0)
    val m = meridionalArc(latR)
    val easting = FalseEasting + K0 * n * (aa + (1 - t + c) * aa * aa * aa / 6
      + (5 - 18 * t + t * t + 72 * c - 58 * E2p) * math.pow(aa, 5) / 120)
    val northing = K0 * (m + n * tanLat * (aa * aa / 2
      + (5 - t + 9 * c + 4 * c * c) * math.pow(aa, 4) / 24
      + (61 - 58 * t + t * t + 600 * c - 330 * E2p) * math.pow(aa, 6) / 720))
    (easting, northing)
  }

  /** UTM → geographic (standard inverse series). `northing` is
    * hemisphere-resolved (false northing already removed for south).
    */
  def utmToLatLon(easting: Double, northing: Double, zone: Int): LatLon = {
    val x = easting - FalseEasting
    val m = northing / K0
    val mu = m / (A * (1 - E2 / 4 - 3 * E2 * E2 / 64 - 5 * E2 * E2 * E2 / 256))
    val e1 = (1 - math.sqrt(1 - E2)) / (1 + math.sqrt(1 - E2))
    val j1 = 3 * e1 / 2 - 27 * math.pow(e1, 3) / 32
    val j2 = 21 * e1 * e1 / 16 - 55 * math.pow(e1, 4) / 32
    val j3 = 151 * math.pow(e1, 3) / 96
    val j4 = 1097 * math.pow(e1, 4) / 512
    val fp = mu + j1 * math.sin(2 * mu) + j2 * math.sin(4 * mu) +
      j3 * math.sin(6 * mu) + j4 * math.sin(8 * mu)
    val sinFp = math.sin(fp)
    val cosFp = math.cos(fp)
    val tanFp = math.tan(fp)
    val c1 = E2p * cosFp * cosFp
    val t1 = tanFp * tanFp
    val r1 = A * (1 - E2) / math.pow(1 - E2 * sinFp * sinFp, 1.5)
    val n1 = A / math.sqrt(1 - E2 * sinFp * sinFp)
    val d = x / (n1 * K0)
    val lat = fp - (n1 * tanFp / r1) * (d * d / 2
      - (5 + 3 * t1 + 10 * c1 - 4 * c1 * c1 - 9 * E2p) * math.pow(d, 4) / 24
      + (61 + 90 * t1 + 298 * c1 + 45 * t1 * t1 - 252 * E2p - 3 * c1 * c1) *
        math.pow(d, 6) / 720)
    val lon = (d - (1 + 2 * t1 + c1) * math.pow(d, 3) / 6
      + (5 - 2 * c1 + 28 * t1 - 3 * c1 * c1 + 8 * E2p + 24 * t1 * t1) *
        math.pow(d, 5) / 120) / cosFp
    LatLon(math.toDegrees(lat),
      math.toDegrees(lon) + zone * 6.0 - 183.0)
  }

  /** Minimum latitude (degrees) of an MGRS latitude band letter. */
  def bandMinLat(band: Char): Double = {
    val idx = LatBands.indexOf(band)
    require(idx >= 0, s"invalid latitude band: $band")
    -80.0 + 8.0 * idx
  }

  def bandMaxLat(band: Char): Double =
    if (band == 'X') 84.0 else bandMinLat(band) + 8.0

  /** Parse a 5-char MGRS tile (e.g. "60WWV") and return the lat/lon of
    * the CENTER of its 100 km grid square — the reference's sort
    * anchor. Row-letter ambiguity (the 2,000 km northing cycle) is
    * resolved against the tile's latitude band.
    */
  def toLatLon(tile: String): LatLon = {
    require(tile.length == 5, s"expected 5-char MGRS tile, got: $tile")
    val zone = tile.substring(0, 2).toInt
    require(zone >= 1 && zone <= 60, s"invalid zone in tile $tile")
    val band = tile.charAt(2)
    val colLetter = tile.charAt(3)
    val rowLetter = tile.charAt(4)

    val colSet = ColSets((zone - 1) % 3)
    val colIdx = colSet.indexOf(colLetter)
    require(colIdx >= 0, s"invalid column letter in tile $tile")
    val e100k = (colIdx + 1) * 100000.0

    val rowSet = if (zone % 2 == 1) RowSetOdd else RowSetEven
    val rowIdx = rowSet.indexOf(rowLetter)
    require(rowIdx >= 0, s"invalid row letter in tile $tile")
    val n100kBase = rowIdx * 100000.0

    val south = band < 'N'
    val latMin = bandMinLat(band)
    val latMax = bandMaxLat(band)
    // Northing (hemisphere frame: south measured from 10,000 km) of
    // the band's edges at the central meridian.
    def frameNorthing(lat: Double): Double = {
      val n = latLonToUtm(lat, zone * 6.0 - 183.0, zone)._2
      if (south) FalseNorthingSouth + n else n
    }
    val nMin = frameNorthing(latMin)
    val nMax = frameNorthing(latMax)
    // Resolve the 2,000 km cycle: pick k so [n, n+100km] overlaps the
    // band's northing range (squares may straddle band edges; accept
    // 100 km slack on both sides).
    val candidates = (-1 to 5).map(k => n100kBase + k * 2000000.0)
    val n = candidates.find(c => c + 100000.0 >= nMin - 1.0 && c <= nMax + 1.0)
      .getOrElse(throw new IllegalArgumentException(
        s"tile $tile: no northing candidate intersects band $band"))

    val centerE = e100k + 50000.0
    val centerNFrame = n + 50000.0
    val centerN = if (south) centerNFrame - FalseNorthingSouth else centerNFrame
    utmToLatLon(centerE, centerN, zone)
  }

  /** Geographic → 5-char MGRS tile (zone + band + 100 km square), the
    * inverse of [[toLatLon]] at 100 km precision.
    */
  def fromLatLon(lat: Double, lon: Double): String = {
    require(lat >= -80 && lat < 84, s"latitude out of MGRS range: $lat")
    val zone = math.min(60, math.max(1, ((lon + 180) / 6).toInt + 1))
    val bandIdx = math.min(19, ((lat + 80) / 8).toInt)
    val band = LatBands(bandIdx)
    val (e, nEq) = latLonToUtm(lat, lon, zone)
    val south = band < 'N'
    val n = if (south) nEq + FalseNorthingSouth else nEq
    val colIdx = (e / 100000.0).toInt - 1
    val colSet = ColSets((zone - 1) % 3)
    require(colIdx >= 0 && colIdx < colSet.length,
      s"easting $e out of 100km-grid range for ($lat, $lon)")
    val rowSet = if (zone % 2 == 1) RowSetOdd else RowSetEven
    val rowIdx = ((n / 100000.0).toInt % 20 + 20) % 20
    f"$zone%02d$band${colSet(colIdx)}${rowSet(rowIdx)}"
  }

  /** Hilbert grid cell of a lat/lon on a 2^bits × 2^bits grid —
    * the same normalization the reference applies (write.py:79-86).
    */
  def toGrid(lat: Double, lon: Double, bits: Int): (Int, Int) = {
    val n = 1 << bits
    val x = ((lon + 180.0) / 360.0 * n).toInt
    val y = ((lat + 90.0) / 180.0 * n).toInt
    (math.max(0, math.min(n - 1, x)), math.max(0, math.min(n - 1, y)))
  }
}
