package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.spatial.{Healpix, Morton, Region}
import graft.units.Units

/** Randomized invariants for the pure-math cores (Morton codec, unit
  * algebra, HEALPix pixelization, region geometry) — the pieces whose
  * bugs would corrupt query results silently rather than crash.
  * Seeded loops (200 cases each), deterministic across runs.
  */
class PropertySpec extends AnyFunSuite {

  private def cases(seed: Long)(body: scala.util.Random => Unit): Unit = {
    val rnd = new scala.util.Random(seed)
    (0 until 200).foreach(_ => body(rnd))
  }

  test("BPE one-pass kernel == sequential applyMerge fold on random words and tables") {
    import graft.operators.Bpe
    import graft.plans.BpeKernel
    import org.apache.spark.unsafe.types.UTF8String
    cases(7) { rnd =>
      // tiny alphabet → dense pair collisions, overlap runs, and
      // products re-used as later merge sides (incl. the re-created-
      // pair and duplicate-entry shapes the unit tests plant by hand)
      val alphabet = Vector("a", "b", "c")
      var pool = alphabet
      val merges = (0 until 1 + rnd.nextInt(8)).map { _ =>
        val a = pool(rnd.nextInt(pool.size)); val b = pool(rnd.nextInt(pool.size))
        pool = pool :+ (a + b)
        (a, b)
      }
      val word = (0 until rnd.nextInt(12)).map(_ => alphabet(rnd.nextInt(3))).mkString
      val ref = merges.foldLeft(word.map(_.toString).toVector) {
        (s, m) => Bpe.applyMerge(s, m._1, m._2)
      }
      val tbl = new BpeKernel.Table(merges.map(_._1).toArray, merges.map(_._2).toArray)
      val got = BpeKernel.encodeWord(UTF8String.fromString(word), tbl)
      val gotSeq = (0 until got.numElements()).map(got.getUTF8String(_).toString)
      assert(gotSeq == ref, s"word=$word merges=$merges")
    }
  }

  test("charEntropy kernel invariants on random unicode strings") {
    import org.apache.spark.unsafe.types.UTF8String
    import graft.plans.TextKernels
    cases(31) { rnd =>
      // mix ASCII, BMP, and astral code points
      val cps = (0 until rnd.nextInt(40)).map { _ =>
        rnd.nextInt(3) match {
          case 0 => 'a' + rnd.nextInt(26)
          case 1 => 0x4E00 + rnd.nextInt(100)
          case _ => 0x1F600 + rnd.nextInt(50)
        }
      }
      val s = new String(cps.toArray.flatMap(Character.toChars(_)))
      val e = TextKernels.charEntropy(UTF8String.fromString(s))
      val distinct = cps.distinct.size
      // bounds: 0 ≤ H ≤ ln(distinct); 0 iff ≤1 distinct symbol
      assert(e >= -1e-12, s"negative entropy $e for '$s'")
      if (distinct <= 1) assert(math.abs(e) < 1e-12)
      else assert(e <= math.log(distinct.toDouble) + 1e-12,
        s"H=$e > ln($distinct) for '$s'")
      // permutation invariance: entropy is a bag property
      val shuf = new String(rnd.shuffle(cps.toList)
        .toArray.flatMap(Character.toChars(_)))
      val e2 = TextKernels.charEntropy(UTF8String.fromString(shuf))
      assert(math.abs(e - e2) < 1e-12)
    }
  }

  test("deflateLen kernel invariants: deterministic, level-monotone-ish, repetition-sensitive") {
    import org.apache.spark.unsafe.types.UTF8String
    import graft.plans.TextKernels
    cases(37) { rnd =>
      val unit = (0 until 1 + rnd.nextInt(8))
        .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      val reps = 2 + rnd.nextInt(30)
      val s = UTF8String.fromString(unit * reps)
      val l6 = TextKernels.deflateLen(s, 6)
      assert(l6 == TextKernels.deflateLen(s, 6)) // deterministic
      assert(l6 > 0 && l6 <= s.numBytes() + 16)  // bounded overhead
      // level 9 never larger than level 1 by more than header slack
      assert(TextKernels.deflateLen(s, 9) <= TextKernels.deflateLen(s, 1) + 8)
      // high repetition compresses below raw once long enough
      if (s.numBytes() > 64) assert(l6 < s.numBytes())
    }
  }

  test("Morton encode/decode round-trips at every level") {
    cases(1) { rnd =>
      val level = 1 + rnd.nextInt(10)
      val m = (1L << level) - 1
      val (cx, cy, cz) = (rnd.nextLong() & m, rnd.nextLong() & m, rnd.nextLong() & m)
      val key = Morton.encode3d(cx, cy, cz, level)
      assert(Morton.decode3d(key, level) == ((cx, cy, cz)))
      assert(key >= 0 && key < (1L << (3 * level)))
    }
  }

  test("Morton prefix nesting: children share the parent's key prefix") {
    cases(2) { rnd =>
      val level = 1 + rnd.nextInt(8)
      val key = math.abs(rnd.nextLong()) % (1L << (3 * level))
      (0 until 8).foreach { oct =>
        assert(((key << 3) | oct) >> 3 == key)
      }
    }
  }

  test("pointKey lands inside the decoded cell's box") {
    cases(3) { rnd =>
      val level = 1 + rnd.nextInt(6)
      val size = 100.0
      val (x, y, z) = (rnd.nextDouble * size * 0.999,
        rnd.nextDouble * size * 0.999, rnd.nextDouble * size * 0.999)
      val key = Morton.pointKey(x, y, z, 0.0, size, level)
      val (cx, cy, cz) = Morton.decode3d(key, level)
      val w = size / (1L << level)
      assert(cx * w <= x + 1e-9 && x < (cx + 1) * w + 1e-9)
      assert(cy * w <= y + 1e-9 && y < (cy + 1) * w + 1e-9)
      assert(cz * w <= z + 1e-9 && z < (cz + 1) * w + 1e-9)
    }
  }

  test("UnitSpec parse/toString round-trips") {
    val names = Vector("Mpc", "kpc", "Msun", "kg", "rad", "deg", "s")
    cases(4) { rnd =>
      val p = rnd.nextInt(7) - 3
      val dims = if (p == 0) Map.empty[String, Int]
                 else Map(names(rnd.nextInt(names.size)) -> p)
      val u = Units.UnitSpec(dims, rnd.nextInt(5) - 2)
      assert(Units.parse(u.toString) == u)
    }
  }

  test("unit conversion factors invert") {
    Seq(("Mpc", "kpc"), ("Mpc", "pc"), ("Msun", "kg"),
      ("rad", "deg"), ("deg", "arcsec"), ("Gyr", "s")).foreach { case (a, b) =>
      val f = Units.unitConversionFactor(Units.parse(a), Units.parse(b))
      val g = Units.unitConversionFactor(Units.parse(b), Units.parse(a))
      assert(math.abs(f * g - 1.0) < 1e-12, s"$a<->$b: $f * $g")
    }
  }

  test("angSep: symmetric, zero at identity, bounded by 180") {
    cases(5) { rnd =>
      val a = Region.SkyP(rnd.nextDouble * 360, rnd.nextDouble * 180 - 90)
      val b = Region.SkyP(rnd.nextDouble * 360, rnd.nextDouble * 180 - 90)
      val ab = Region.angSep(a, b)
      assert(math.abs(ab - Region.angSep(b, a)) < 1e-9)
      assert(ab >= 0 && ab <= 180.0 + 1e-9)
      assert(Region.angSep(a, a) < 1e-9)
    }
  }

  test("hierarchical queryDisc equals the exhaustive scan") {
    cases(9) { rnd =>
      val nside = Seq(1, 2, 4, 8, 16)(rnd.nextInt(5))
      val center = Region.SkyP(rnd.nextDouble * 360, rnd.nextDouble * 170 - 85)
      val radius = 0.5 + rnd.nextDouble * 30
      val fast = Healpix.queryDisc(nside, center, radius)
      // exhaustive reference: same criterion over every pixel
      val pad = Healpix.MaxCenterToPointFactor * Healpix.charDeg(nside)
      val slow = (0L until Healpix.npix(nside)).filter { p =>
        val (ra, dec) = Healpix.pix2angNest(nside, p)
        Region.angSep(center, Region.SkyP(ra, dec)) <= radius + pad
      }.toSet
      assert(fast == slow, s"nside=$nside center=$center r=$radius " +
        s"missing=${(slow -- fast).take(5)} extra=${(fast -- slow).take(5)}")
    }
  }

  test("center-to-point distance never exceeds the 2.5-charDeg bound") {
    // the bound every pixel-prefiltered consumer leans on (queryDisc
    // inclusion, cross-match cover): a random point is never further
    // from ITS pixel's center than MaxCenterToPointFactor char sizes
    cases(8) { rnd =>
      val nside = Seq(1, 2, 4, 8, 16, 64)(rnd.nextInt(6))
      val bound = Healpix.MaxCenterToPointFactor * Healpix.charDeg(nside)
      (0 until 500).foreach { _ =>
        // uniform on the sphere (z uniform), poles included
        val z = rnd.nextDouble * 2 - 1
        val dec = math.toDegrees(math.asin(z))
        val ra = rnd.nextDouble * 360
        val pix = Healpix.ang2pixNest(nside, ra, dec)
        val (cra, cdec) = Healpix.pix2angNest(nside, pix)
        val d = Region.angSep(Region.SkyP(ra, dec), Region.SkyP(cra, cdec))
        assert(d <= bound,
          s"nside=$nside point=($ra,$dec) pix=$pix center=($cra,$cdec) d=$d > $bound")
      }
    }
  }

  test("healpix ang2pix(pix2ang) is the identity on pixel centers") {
    cases(6) { rnd =>
      val nside = Seq(1, 2, 4, 8, 16)(rnd.nextInt(5))
      val pix = math.abs(rnd.nextLong()) % Healpix.npix(nside)
      val (ra, dec) = Healpix.pix2angNest(nside, pix)
      assert(Healpix.ang2pixNest(nside, ra, dec) == pix)
    }
  }

  test("box classify agrees with its own point membership") {
    import Region._
    cases(7) { rnd =>
      def p3() = P3(rnd.nextDouble * 100, rnd.nextDouble * 100, rnd.nextDouble * 100)
      val bmin = p3()
      val b = Box(bmin, P3(bmin.x + 1 + rnd.nextDouble * 20,
        bmin.y + 1 + rnd.nextDouble * 20, bmin.z + 1 + rnd.nextDouble * 20))
      val c0 = p3(); val c1 = p3()
      val lo = P3(math.min(c0.x, c1.x), math.min(c0.y, c1.y), math.min(c0.z, c1.z))
      val hi = P3(math.max(c0.x, c1.x) + 0.001, math.max(c0.y, c1.y) + 0.001,
        math.max(c0.z, c1.z) + 0.001)
      b.classify(lo, hi) match {
        case Contained =>
          assert(b.contains(lo))
          assert(b.contains(P3(hi.x - 1e-9, hi.y - 1e-9, hi.z - 1e-9)))
        case Disjoint =>
          // no sampled point of the cell may be inside the box
          (0 until 10).foreach { _ =>
            val q = P3(lo.x + rnd.nextDouble * (hi.x - lo.x),
              lo.y + rnd.nextDouble * (hi.y - lo.y),
              lo.z + rnd.nextDouble * (hi.z - lo.z))
            assert(!b.contains(q))
          }
        case Intersects => ()
      }
    }
  }

  test("octree classifyCells partitions: contained ∪ boundary covers the region") {
    import Region._
    cases(8) { rnd =>
      val level = 2 + rnd.nextInt(3)
      val size = 64.0
      val bmin = P3(rnd.nextDouble * 40, rnd.nextDouble * 40, rnd.nextDouble * 40)
      val box = Box(bmin, P3(bmin.x + 5 + rnd.nextDouble * 15,
        bmin.y + 5 + rnd.nextDouble * 15, bmin.z + 5 + rnd.nextDouble * 15))
      val plan = graft.spatial.Octree.classifyCells(box, 0.0, size, level)
      def inPlan(key: Long, rs: Seq[(Long, Long)]) =
        rs.exists { case (lo, hi) => key >= lo && key < hi }
      // every point of the region maps to a covered cell; contained
      // cells really are fully inside
      (0 until 20).foreach { _ =>
        val q = P3(box.min.x + rnd.nextDouble * (box.max.x - box.min.x),
          box.min.y + rnd.nextDouble * (box.max.y - box.min.y),
          box.min.z + rnd.nextDouble * (box.max.z - box.min.z))
        val key = Morton.pointKey(q.x, q.y, q.z, 0.0, size, level)
        assert(inPlan(key, plan.contained) || inPlan(key, plan.boundary),
          s"point $q (key $key) uncovered")
      }
    }
  }

  test("discCoverCached (the graft_healpix_disc kernel) equals queryDisc at every pixel") {
    // the codegen'd cross-match cover must be EXACTLY the hierarchical
    // disc query at the pixel's center — per pixel, any nside/radius
    // (the memo key), sorted for a deterministic explode order
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 40) {
      val nside = 1 << (1 + rnd.nextInt(4)) // 2..16
      val pix = math.abs(rnd.nextLong()) % Healpix.npix(nside)
      val radius = 0.5 + rnd.nextDouble() * 10.0
      val got = Healpix.discCoverCached(nside, pix, radius)
      val (cra, cdec) = Healpix.pix2angNest(nside, pix)
      val want = Healpix.queryDisc(nside, Region.SkyP(cra, cdec), radius)
        .toArray.sorted
      assert(got.toLongArray().toSeq == want.toSeq,
        s"nside=$nside pix=$pix r=$radius")
    }
  }
}
