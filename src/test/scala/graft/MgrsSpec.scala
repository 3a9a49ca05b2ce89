package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.geo.Mgrs
import graft.expressions.{HilbertIndex, MortonIndex}

class MgrsSpec extends AnyFunSuite {

  test("UTM forward/inverse roundtrip, both hemispheres") {
    val pts = Seq((48.2, 16.4), (-33.9, 151.2), (0.5, 3.2), (-77.8, 166.7),
      (65.0, 177.0), (21.3, -157.9))
    for ((lat, lon) <- pts) {
      val zone = ((lon + 180) / 6).toInt + 1
      val (e, n) = Mgrs.latLonToUtm(lat, lon, zone)
      val ll = Mgrs.utmToLatLon(e, n, zone)
      assert(math.abs(ll.lat - lat) < 1e-6, s"lat roundtrip for ($lat,$lon)")
      assert(math.abs(ll.lon - lon) < 1e-6, s"lon roundtrip for ($lat,$lon)")
    }
  }

  test("known UTM value: Vienna (48.2N 16.4E) is zone 33, ~601km E") {
    // Public reference point: 48.2°N 16.4°E ≈ UTM 33U E601-602km N5339-5340km
    val (e, n) = Mgrs.latLonToUtm(48.2, 16.4, 33)
    assert(math.abs(e - 604000) < 3000, s"easting $e")
    assert(math.abs(n - 5339000) < 3000, s"northing $n")
  }

  test("fromLatLon → toLatLon returns a center within 100km square") {
    val pts = Seq((65.0, 177.0), (-77.8, 166.7), (48.2, 16.4),
      (38.9, -77.0), (-33.9, 151.2), (21.3, -157.9), (51.5, -0.1),
      (-22.9, -43.2), (31.2, 121.5), (60.2, 24.9))
    for ((lat, lon) <- pts) {
      val tile = Mgrs.fromLatLon(lat, lon)
      val c = Mgrs.toLatLon(tile)
      // center of the 100km square containing the point is within
      // ~±0.71*100km ≈ ≤1.3° lat of the point itself
      assert(math.abs(c.lat - lat) < 1.5, s"$tile center lat ${c.lat} vs $lat")
      val dLon = math.abs((c.lon - lon + 540) % 360 - 180)
      assert(dLon < 3.5, s"$tile center lon ${c.lon} vs $lon")
    }
  }

  test("band boundaries: bandMinLat spans -80..72, X is 12 degrees") {
    assert(Mgrs.bandMinLat('C') === -80.0)
    assert(Mgrs.bandMinLat('X') === 72.0)
    assert(Mgrs.bandMaxLat('X') === 84.0)
    assert(Mgrs.bandMinLat('N') === 0.0)
  }

  test("hilbert xy2d matches hand-computed small-grid values") {
    // 2-bit (4x4) Hilbert curve, standard orientation:
    // d: (0,0)=0 (1,0)=? — assert bijectivity + locality instead of
    // memorized table, plus the defining corner values.
    assert(HilbertIndex.xy2d(1, 0, 0) === 0L)
    assert(HilbertIndex.xy2d(1, 0, 1) === 1L)
    assert(HilbertIndex.xy2d(1, 1, 1) === 2L)
    assert(HilbertIndex.xy2d(1, 1, 0) === 3L)
    val n = 1 << 4
    val seen = collection.mutable.Set[Long]()
    for (x <- 0 until n; y <- 0 until n) {
      val d = HilbertIndex.xy2d(4, x, y)
      assert(d >= 0 && d < n.toLong * n)
      assert(seen.add(d), s"duplicate d=$d at ($x,$y)")
      val (rx, ry) = HilbertIndex.d2xy(4, d)
      assert(rx === x && ry === y, s"d2xy roundtrip at ($x,$y)")
    }
    // locality: consecutive d are adjacent cells (the Hilbert property)
    for (d <- 0L until (n.toLong * n - 1)) {
      val (x1, y1) = HilbertIndex.d2xy(4, d)
      val (x2, y2) = HilbertIndex.d2xy(4, d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1,
        s"non-adjacent steps at d=$d")
    }
  }

  test("morton interleave known values") {
    assert(MortonIndex.interleave(2, 0, 0) === 0L)
    assert(MortonIndex.interleave(2, 1, 0) === 1L)
    assert(MortonIndex.interleave(2, 0, 1) === 2L)
    assert(MortonIndex.interleave(2, 3, 3) === 15L)
    assert(MortonIndex.interleave(14, 16383, 16383) === (1L << 28) - 1)
  }

  test("clamping: out-of-grid coordinates clamp, never throw") {
    assert(HilbertIndex.xy2d(14, -5, 20000) ===
      HilbertIndex.xy2d(14, 0, 16383))
  }
}
