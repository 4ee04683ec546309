package graft

import org.scalacheck.Gen
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.Kernels

/** Property-based invariants (SURVEY §5): metric identities, smart-key
  * round-trips, and kernel algebraic laws. (scalacheck generators driven
  * directly — the scalatest bridge artifact isn't on the offline
  * classpath.)
  */
class PropertySpec extends SparkSpec {

  private def forAll[A](gen: Gen[A], n: Int = 100)(f: A => Unit): Unit =
    (0 until n).foreach(_ => gen.sample.foreach(f))

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    (0 until 100).foreach(_ =>
      for (a <- ga.sample; b <- gb.sample) f(a, b))

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def arr(ss: Seq[String]) =
    new GenericArrayData(ss.map(s => UTF8String.fromString(s)).toArray[Any])

  test("minhash signature: element-wise monotone under set growth, order-invariant") {
    val gens = Gen.nonEmptyListOf(Gen.alphaNumStr.suchThat(_.nonEmpty))
    forAll(gens) { raw =>
      val hs = raw.map(md5hex)
      val sig = Kernels.minhashes(arr(hs), 8).toLongArray()
      // order invariance
      val sigR = Kernels.minhashes(arr(hs.reverse), 8).toLongArray()
      assert(sig.toSeq === sigR.toSeq)
      // growing the set can only lower (or keep) each signature slot
      val sig2 = Kernels.minhashes(arr(hs :+ md5hex("extra")), 8).toLongArray()
      assert(sig.zip(sig2).forall { case (a, b) => b <= a })
      // identical sets → identical signatures (dedup-stability)
      val sigDup = Kernels.minhashes(arr(hs ++ hs), 8).toLongArray()
      assert(sig.toSeq === sigDup.toSeq)
    }
  }

  test("cosine kernel: self-similarity 1, symmetry, scale invariance") {
    val vecGen = Gen.listOfN(16, Gen.choose(-10.0f, 10.0f))
      .suchThat(v => v.exists(x => math.abs(x) > 0.01f))
    def farr(v: Seq[Float]) = new GenericArrayData(v.toArray[Any])
    forAll(vecGen, vecGen) { (a, b) =>
      assert(math.abs(Kernels.cosine(farr(a), farr(a)) - 1.0) < 1e-12)
      assert(Kernels.cosine(farr(a), farr(b)) ===
        Kernels.cosine(farr(b), farr(a)))
      val sim = Kernels.cosine(farr(a), farr(b))
      assert(sim >= -1.0 - 1e-12 && sim <= 1.0 + 1e-12)
    }
  }

  test("TopKByScore: reduce/merge agree with sort-take under any split") {
    import graft.functions.TopKByScore
    // the aggregator keeps a SORTED buffer with an O(1) reject fast path
    // and a linear merge — this pins its results to the naive
    // specification (sort everything, take k) for random inputs, random
    // k, and random partition splits (merge associativity in practice)
    val eltGen = for {
      s <- Gen.choose(-5.0, 5.0)
      id <- Gen.choose(0L, 50L) // small id space → frequent score ties
    } yield (s, id)
    val inputGen = for {
      xs <- Gen.listOf(eltGen)
      k <- Gen.choose(1, 7)
      cut <- Gen.choose(0, xs.length max 0)
    } yield (xs, k, cut)
    def spec(xs: Seq[(Double, Long)], k: Int) =
      xs.sortBy { case (s, id) => (-s, id) }.take(k)
    forAll(inputGen, 300) { case (xs, k, cut) =>
      val agg = TopKByScore(k)
      // single-buffer reduction
      val direct = xs.foldLeft(agg.zero)(agg.reduce)
      assert(direct === spec(xs, k))
      // split + merge at an arbitrary point (partial aggregation shape)
      val (l, r) = xs.splitAt(cut)
      val merged = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      assert(merged === spec(xs, k))
      // merging with the empty buffer is identity
      assert(agg.merge(direct, agg.zero) === direct)
      assert(agg.merge(agg.zero, direct) === direct)
    }
    // guarded construction: k <= 0 must fail fast, not corrupt reduce
    intercept[IllegalArgumentException](TopKByScore(0))
  }

  test("KMinValues: reduce/merge agree with sorted-distinct-take under any split") {
    import graft.functions.KMinValues
    // same discipline as the TopKByScore pin, plus the DEDUP obligation:
    // a small value space forces heavy duplication, so any buffer that
    // admits a repeated value (or loses one on merge) diverges from the
    // sorted-distinct specification immediately
    val inputGen = for {
      xs <- Gen.listOf(Gen.choose(0L, 30L))
      k <- Gen.choose(1, 7)
      cut <- Gen.choose(0, xs.length max 0)
    } yield (xs, k, cut)
    def spec(xs: Seq[Long], k: Int) = xs.distinct.sorted.take(k)
    forAll(inputGen, 300) { case (xs, k, cut) =>
      val agg = KMinValues(k)
      val direct = xs.foldLeft(agg.zero)(agg.reduce)
      assert(direct === spec(xs, k))
      val (l, r) = xs.splitAt(cut)
      val merged = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      assert(merged === spec(xs, k))
      assert(agg.merge(direct, agg.zero) === direct)
      assert(agg.merge(agg.zero, direct) === direct)
    }
    intercept[IllegalArgumentException](KMinValues(0))
  }

  test("window_hashes: count law, per-window digest parity, suffix shift") {
    val toksGen = Gen.listOf(Gen.alphaNumStr.suchThat(_.nonEmpty))
    val kGen = Gen.choose(1, 6)
    forAll(toksGen, kGen) { (toks, k) =>
      val hs = Kernels.windowHashes(arr(toks), k).toLongArray()
      assert(hs.length == math.max(0, toks.length - k + 1))
      // element i == the 15-hex-char parse of md5 of the raw window
      hs.zipWithIndex.foreach { case (h, i) =>
        val w = toks.slice(i, i + k).mkString(" ")
        assert(h == java.lang.Long.parseLong(md5hex(w).substring(0, 15), 16))
      }
      // dropping the first token shifts the window sequence by one
      if (toks.length > k)
        assert(hs.drop(1).toSeq ==
          Kernels.windowHashes(arr(toks.tail), k).toLongArray().toSeq)
    }
  }

  test("zorder64: interleave roundtrip and per-argument monotonicity") {
    val u32 = Gen.choose(0L, 0xFFFFFFFFL)
    def unspread(z: Long): Long = {
      var v = z & 0x5555555555555555L
      v = (v | (v >> 1)) & 0x3333333333333333L
      v = (v | (v >> 2)) & 0x0F0F0F0F0F0F0F0FL
      v = (v | (v >> 4)) & 0x00FF00FF00FF00FFL
      v = (v | (v >> 8)) & 0x0000FFFF0000FFFFL
      (v | (v >> 16)) & 0xFFFFFFFFL
    }
    forAll(u32, u32) { (a, b) =>
      val z = Kernels.zorder64(a, b)
      assert(unspread(z) == a && unspread(z >> 1) == b)
      // the spread is order-preserving and the two arguments occupy
      // disjoint bit positions, so z is strictly monotone in each
      if (a < 0xFFFFFFFFL) assert(Kernels.zorder64(a + 1, b) > z)
      if (b < 0xFFFFFFFFL) assert(Kernels.zorder64(a, b + 1) > z)
    }
  }

  test("smart date key: YYYYMMDD round-trips through date parts") {
    val dates = Gen.choose(0L, 365L * 30)
      .map(d => java.time.LocalDate.of(1995, 1, 1).plusDays(d))
    forAll(dates) { d =>
      val key = d.getYear * 10000 + d.getMonthValue * 100 + d.getDayOfMonth
      assert(key / 10000 === d.getYear)
      assert(key / 100 % 100 === d.getMonthValue)
      assert(key % 100 === d.getDayOfMonth)
    }
  }

  test("l2_sq kernel: bit-exact vs the three-fold template, zero on self, non-negative") {
    val vecGen = Gen.listOfN(16, Gen.choose(-10.0f, 10.0f))
    def farr(v: Seq[Float]) = new GenericArrayData(v.toArray[Any])
    // the reference: THREE separate left-to-right folds combined as
    // (dv - 2.0*vc) + cc — exactly TextExprs.dot's evaluation order,
    // which the DuckDB oracles mirror; the kernel must agree BIT-exactly
    def ref(a: Seq[Float], b: Seq[Float]): Double = {
      val dv = a.foldLeft(0.0)((s, x) => s + x.toDouble * x.toDouble)
      val vc = a.zip(b).foldLeft(0.0)((s, p) => s + p._1.toDouble * p._2.toDouble)
      val cc = b.foldLeft(0.0)((s, x) => s + x.toDouble * x.toDouble)
      dv - 2.0 * vc + cc
    }
    forAll(vecGen, vecGen) { (a, b) =>
      val k = Kernels.l2sq(farr(a), farr(b), aFloat = true, bFloat = true)
      assert(java.lang.Double.doubleToLongBits(k) ===
        java.lang.Double.doubleToLongBits(ref(a, b)),
        s"kernel diverged from the fold template on $a / $b")
      // |a-a|² is exactly 0 (aa - 2·aa + aa cancels exactly in IEEE)
      assert(Kernels.l2sq(farr(a), farr(a), aFloat = true, bFloat = true) === 0.0)
      assert(k >= -1e-9, s"squared distance must be non-negative, got $k")
    }
  }

  test("scd2MergeOn: versioned-merge invariants under random update sets") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(42)
    for (round <- 1 to 5) {
      val n = 15 + rnd.nextInt(10)
      val keys = (1L to n).toSeq
      // dimension with two attributes; attr2 null for some keys (the
      // null-safe change-detection surface)
      val cur = keys.map { k =>
        (k, s"v$k", if (k % 5 == 0) null else s"w$k",
          java.sql.Date.valueOf("1995-01-01"),
          java.sql.Date.valueOf("9999-12-31"), true)
      }.toDF("k", "a1", "a2", "valid_from", "valid_to", "vigente")
      val changedKeys = keys.filter(_ => rnd.nextBoolean()).toSet
      val newKeys = (n + 1L to n + 3L).toSet
      val up = (keys.map { k =>
        if (changedKeys(k)) (k, s"v$k'", s"w$k'")   // includes null→value flips
        else (k, s"v$k", if (k % 5 == 0) null else s"w$k") // no-op re-delivery
      } ++ newKeys.map(k => (k, s"nv$k", s"nw$k"))).toDF("k", "a1", "a2")
      val merged = graft.etl.Scd.scd2MergeOn(cur, up, "k", Seq("a1", "a2"),
        "2000-06-01").cache()
      // row count: every original row survives + one closed version per
      // changed key + one open row per brand-new key
      assert(merged.count() === n + changedKeys.size + newKeys.size)
      // exactly one open version per key
      val open = merged.filter(col("vigente"))
      assert(open.count() === n + newKeys.size)
      assert(open.select("k").distinct().count() === n + newKeys.size)
      // unchanged keys (incl. the null-attr no-op re-deliveries) pass
      // through byte-identical — still open since the epoch
      assert(open.filter(!col("k").isInCollection(changedKeys ++ newKeys) &&
        col("valid_from") === lit("1995-01-01").cast("date")).count()
        === n - changedKeys.size)
      // changed keys: closed old version at the load date + reopened row
      val closed = merged.filter(!col("vigente"))
      assert(closed.count() === changedKeys.size)
      assert(closed.filter(col("valid_to") === lit("2000-06-01").cast("date"))
        .count() === changedKeys.size)
      assert(open.filter(col("k").isInCollection(changedKeys) &&
        col("valid_from") === lit("2000-06-01").cast("date")).count()
        === changedKeys.size)
      // applying the SAME batch again changes nothing (idempotent merge:
      // re-delivered attributes equal the now-current versions)
      val again = graft.etl.Scd.scd2MergeOn(merged, up, "k", Seq("a1", "a2"),
        "2000-07-01")
      assert(again.count() === merged.count())
      assert(again.filter(!col("vigente")).count() === changedKeys.size)
      merged.unpersist()
    }
  }

  test("fact metric identity holds on generated rows in DecimalType") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // random (price, qty, discount) rows through the Star metric formulas
    val rows = (1 to 200).map { i =>
      (i.toLong, 1, math.round((i * 77.77 % 10000) * 100) / 100.0,
        (i % 10) / 100.0)
    }.toDF("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
    val ep = col("l_extendedprice").cast("decimal(18,2)")
    val disc = col("l_discount").cast("decimal(4,2)")
    val one = lit("1.00").cast("decimal(3,2)")
    val m = rows.select(
      ep.as("bruto"),
      (ep * disc).as("desc"),
      (ep * (one - disc)).as("total"))
    // valor_total + valor_desconto == valor_bruto, exactly — in DECIMAL;
    // (cast to double first and the identity only holds to 1 ulp)
    assert(m.filter(col("total") + col("desc") =!= col("bruto")).count() === 0)
  }
}
