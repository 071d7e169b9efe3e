package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps._
import graft.operators.Similarity
import graft.functions.GraftFunctions

/** Native hashing kernels ([[graft.functions.HashExprs]]) must be
  * bit-identical to their interpreted HOF specs in TextOps — the specs
  * are what the DuckDB oracle SQL mirrors, so kernel drift would
  * silently break the correctness gate. Exercised over the real
  * documents/embeddings corpus (covers empty arrays: docs under 3 words
  * shingle to [] with a null signature). */
class HashKernelSpec extends SparkSpecBase {

  private def docs = spark.read
    .parquet(s"$sf/documents.parquet")
    .select(col("doc_id"), words(col("text")).as("ws"))
    .select(col("doc_id"), col("ws"), shingles3(col("ws")).as("sh"))

  private def assertNoDiff(diff: org.apache.spark.sql.DataFrame): Unit = {
    val bad = diff.limit(5).collect()
    assert(bad.isEmpty, s"kernel != spec:\n${bad.mkString("\n")}")
  }

  test("shingle_hash32 kernel matches the HOF spec") {
    assertNoDiff(docs
      .select(col("doc_id"), shingleHash32(col("sh")).as("k"),
        shingleHash32Hof(col("sh")).as("s"))
      .filter(not(col("k") <=> col("s"))))
  }

  test("minhash_sig kernel matches the HOF spec") {
    assertNoDiff(docs
      .select(col("doc_id"), shingleHash32(col("sh")).as("hh"))
      .select(col("doc_id"),
        minhashFromHashes(col("hh"), 7).as("k"),
        minhashFromHashesHof(col("hh"), 7).as("s"))
      .filter(not(col("k") <=> col("s"))))
  }

  test("simhash32 kernel matches the HOF spec") {
    assertNoDiff(docs
      .select(col("doc_id"), simhash32(col("ws")).as("k"),
        simhash32FromMd5s(wordMd5s(col("ws"))).as("s"))
      .filter(not(col("k") <=> col("s"))))
  }

  test("min_md5 kernel matches array_min(transform(md5)) incl. empty arrays") {
    assertNoDiff(docs
      .select(col("doc_id"), minMd5(col("sh")).as("k"),
        array_min(transform(col("sh"), x => md5(x))).as("s"))
      .filter(not(col("k") <=> col("s"))))
  }

  test("dot_fp9 kernel matches the HOF spec") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val pairs = e.crossJoin(
      e.select(col("vec_id").as("v2"), col("embedding").as("e2"))
        .limit(3))
    assertNoDiff(pairs
      .select(
        Similarity.dotFp9(col("embedding"), col("e2")).as("k"),
        Similarity.dotFp9Hof(col("embedding"), col("e2")).as("s"))
      .filter(not(col("k") <=> col("s"))))
  }

  test("dot_i64 kernel matches the HOF spec on the quantized corpus") {
    val e = Similarity.quantized(spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding")))
    val pairs = e.select(col("q8")).crossJoin(
      e.select(col("q8").as("q2")).limit(3))
    assertNoDiff(pairs
      .select(
        Similarity.qdot(col("q8"), col("q2")).as("k"),
        Similarity.qdotHof(col("q8"), col("q2")).as("s"))
      .filter(not(col("k") <=> col("s"))))
  }

  test("property: dot_i64 matches the HOF on adversarial long arrays (nulls, empties, length skew)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    // bounded values: the kernel's contract hands overflow to the
    // caller (int8 domain), so the property stays inside ±1e6 where
    // Java's wrapping * and the ANSI-mode HOF agree exactly
    val elemGen = Gen.frequency(
      8 -> Gen.chooseNum(-1000000L, 1000000L).map(Option(_)),
      1 -> Gen.const(Option.empty[Long]))
    val arrGen = Gen.frequency(
      8 -> Gen.listOf(elemGen).map(l => Option(l.take(12))),
      1 -> Gen.const(Option.empty[List[Option[Long]]]))
    val prop = Prop.forAll(Gen.listOfN(8, Gen.zip(arrGen, arrGen))) { pairs =>
      val df = pairs.toDF("a", "b")
      df.select(
        Similarity.qdot(col("a"), col("b")).as("k"),
        Similarity.qdotHof(col("a"), col("b")).as("s"))
        .filter(not(col("k") <=> col("s")))
        .count() == 0L
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("split_words kernel matches the HOF spec on the real corpus") {
    assertNoDiff(spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), words(col("text")).as("k"),
        wordsHof(col("text")).as("s"))
      .filter(not(col("k") <=> col("s"))))
  }

  test("word_ngrams kernels match the HOF specs on the real corpus") {
    assertNoDiff(spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), words(col("text")).as("ws"))
      .select(col("doc_id"),
        bigrams2(col("ws")).as("bk"), bigrams2Hof(col("ws")).as("bs"),
        shingles3(col("ws")).as("sk"), shingles3Hof(col("ws")).as("ss"))
      .filter(not(col("bk") <=> col("bs")) || not(col("sk") <=> col("ss"))))
  }

  test("property: tokenizer kernels match specs on adversarial text " +
      "(multi-space, leading/trailing, unicode, tabs/newlines untouched, null)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    val tokGen = Gen.oneOf(
      Gen.const(""),
      Gen.alphaNumStr.map(_.take(8)),
      Gen.nonEmptyListOf(Gen.oneOf("ä", "中", "💡", "é", "\t", "\n", "|"))
        .map(_.mkString.take(6)))
    val textGen = Gen.frequency(
      8 -> Gen.listOf(Gen.zip(tokGen, Gen.chooseNum(1, 3)))
        .map(_.map { case (t, k) => t + (" " * k) }.mkString)
        .map(Option(_)),
      1 -> Gen.const(Option.empty[String]))
    val prop = Prop.forAll(Gen.listOfN(8, textGen)) { texts =>
      val df = texts.toDF("t")
      df.select(
        words(col("t")).as("wk"), wordsHof(col("t")).as("wsp"))
        .withColumn("bk", bigrams2(col("wk")))
        .withColumn("bs", bigrams2Hof(col("wsp")))
        .withColumn("sk", shingles3(col("wk")))
        .withColumn("ss", shingles3Hof(col("wsp")))
        .filter(not(col("wk") <=> col("wsp")) || not(col("bk") <=> col("bs")) ||
          not(col("sk") <=> col("ss")))
        .count() == 0L
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("word_ngrams: null-bearing arrays reproduce the nested concat_ws " +
      "semantics (skip-null join incl. the trailing-space artifact)") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq[String]("a", "b", "c", "d")),
      (2L, Seq[String]("a", null, "c")),
      (3L, Seq[String]("x", null, null)),
      (4L, Seq[String](null, null, null)),
      (5L, Seq[String]("", "b", "")),
      (6L, Seq[String]("only")),
      (7L, Seq[String]())).toDF("id", "ws")
    assertNoDiff(df.select(col("id"),
        bigrams2(col("ws")).as("bk"), bigrams2Hof(col("ws")).as("bs"),
        shingles3(col("ws")).as("sk"), shingles3Hof(col("ws")).as("ss"))
      .filter(not(col("bk") <=> col("bs")) || not(col("sk") <=> col("ss"))))
  }

  test("word_windows kernel matches the transform+slice+array_join HOF " +
      "forms (overlapping full-only and strided truncating), incl. " +
      "null elements, empty strings, short and null arrays") {
    import spark.implicits._
    val W = 6
    val seg = 4
    val real = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id").cast("string").as("id"), words(col("text")).as("ws"))
    val edge = Seq(
      ("e1", Seq[String]("a", null, "c", "", "e", "f", "g")),
      ("e2", Seq[String](null, null, null, null, null, null)),
      ("e3", Seq[String]("x", "y")),
      ("e4", Seq[String]()),
      ("e5", null.asInstanceOf[Seq[String]])).toDF("id", "ws")
    val df = real.unionByName(edge)
    def hofFull(ws: org.apache.spark.sql.Column) =
      when(size(ws) >= W,
        transform(sequence(lit(0L), (size(ws) - W).cast("long")), p =>
          array_join(slice(ws, (p + 1L).cast("int"), lit(W)), " ")))
        .otherwise(array().cast("array<string>"))
    def hofSeg(ws: org.apache.spark.sql.Column) =
      when(size(ws) > 0,
        transform(
          sequence(lit(0L), idiv(size(ws) + lit(seg - 1), lit(seg)) - 1L),
          i => array_join(slice(ws, (i * seg + 1).cast("int"), lit(seg)), " ")))
        .otherwise(array().cast("array<string>"))
    val bad = df.select(col("id"),
        GraftFunctions.word_windows(col("ws"), W, 1, fullOnly = true).as("fk"),
        hofFull(col("ws")).as("fs"),
        GraftFunctions.word_windows(col("ws"), seg, seg, fullOnly = false).as("sk"),
        hofSeg(col("ws")).as("ss"))
      .filter(not(col("fk") <=> col("fs")) || not(col("sk") <=> col("ss")))
    assertNoDiff(bad)
  }

  test("property: kernels match specs on adversarial inputs (unicode, empties, null elements)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    val strGen = Gen.oneOf(
      Gen.const(""),
      Gen.alphaNumStr.map(_.take(12)),
      Gen.nonEmptyListOf(Gen.oneOf("ä", "中", "💡", "é", " ", "|"))
        .map(_.mkString.take(8)))
    val arrGen = Gen.listOf(strGen).map(_.take(16))
    val prop = Prop.forAll(Gen.listOfN(8, arrGen)) { (arrays: List[List[String]]) =>
      val df = arrays.toDF("a")
      val bad = df.select(
        shingleHash32(col("a")).as("hk"), shingleHash32Hof(col("a")).as("hs"),
        simhash32(col("a")).as("sk"), simhash32FromMd5s(wordMd5s(col("a"))).as("ss"),
        minMd5(col("a")).as("mk"), array_min(transform(col("a"), x => md5(x))).as("ms"))
        .filter(not(col("hk") <=> col("hs")) || not(col("sk") <=> col("ss")) ||
          not(col("mk") <=> col("ms")))
        .count()
      bad == 0L
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: sketch aggregates equal JVM reference folds under " +
      "arbitrary partitioning; duplication is free for OR/MAX merges and " +
      "exactly doubles the additive CMS") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    val posGen = Gen.listOf(Gen.chooseNum(0L, 4095L)).map(_.take(8))
    val hashGen = Gen.chooseNum(0L, (1L << 60) - 1)
    val wordGen = Gen.alphaNumStr.map(w => if (w.isEmpty) "x" else w.take(6))
    val prop = Prop.forAll(
      Gen.listOfN(24, posGen), Gen.listOfN(24, hashGen),
      Gen.listOfN(24, wordGen), Gen.chooseNum(1, 7)) {
      (poss, hs, ws, nPart) =>
        // Bloom (m = 4096): distributed == JVM bitset; dup-insensitive
        def bloomOf(df: org.apache.spark.sql.DataFrame): Seq[Long] =
          df.repartition(nPart).groupBy()
            .agg(GraftFunctions.bloom_sketch(col("pos"), 4096))
            .collect().head.getSeq[Long](0)
        val bdf = poss.toDF("pos")
        val bref = new Array[Long](64)
        poss.flatten.foreach(p => bref((p >>> 6).toInt) |= 1L << (p & 63L))
        val bloomOk = bloomOf(bdf) == bref.toSeq &&
          bloomOf(bdf.union(bdf)) == bref.toSeq
        // HLL (m = 64): distributed == JVM register maxima; dup-insensitive
        def hllOf(df: org.apache.spark.sql.DataFrame): Seq[Long] =
          df.repartition(nPart).groupBy()
            .agg(GraftFunctions.hll_sketch(col("h"), 64))
            .collect().head.getSeq[Long](0)
        val hdf = hs.toDF("h")
        val href = new Array[Long](64)
        hs.foreach { h =>
          val idx = (h % 64L).toInt
          val w = h >>> 6
          val rank =
            if (w == 0L) 55L
            else 55L - (64 - java.lang.Long.numberOfLeadingZeros(w))
          if (rank > href(idx)) href(idx) = rank
        }
        val hllOk = hllOf(hdf) == href.toSeq &&
          hllOf(hdf.union(hdf)) == href.toSeq
        // CMS (4×256): distributed == JVM counters; duplication DOUBLES
        import graft.operators.TextAnalysis.{CmsDepth, CmsWidth, cmsHashes}
        def cmsOf(df: org.apache.spark.sql.DataFrame): Seq[Long] =
          df.repartition(nPart)
            .select(cmsHashes(col("w")).as("hs")).groupBy()
            .agg(GraftFunctions.cms_sketch(col("hs"), CmsDepth, CmsWidth))
            .collect().head.getSeq[Long](0)
        val cdf = ws.toDF("w")
        val cref = new Array[Long](CmsDepth * CmsWidth)
        ws.foreach { w =>
          (0 until CmsDepth).foreach { j =>
            val hex = java.security.MessageDigest.getInstance("MD5")
              .digest(s"$j:$w".getBytes("UTF-8"))
              .map("%02x".format(_)).mkString.take(8)
            val b = (java.lang.Long.parseLong(hex, 16) % CmsWidth).toInt
            cref(j * CmsWidth + b) += 1L
          }
        }
        val cgot = cmsOf(cdf)
        val cmsOk = cgot == cref.toSeq &&
          cmsOf(cdf.union(cdf)) == cref.toSeq.map(_ * 2L)
        // WEIGHTED ingestion (r18, VERDICT r17 #5): the pre-aggregated
        // (token, count) form through the weight child must equal the
        // per-occurrence sketch BIT FOR BIT (integer-sum commutativity
        // — x26's ~8×-fewer-digests rewrite rests on exactly this)
        val wgot = cdf.groupBy(col("w")).agg(count(lit(1)).as("n"))
          .repartition(nPart)
          .select(cmsHashes(col("w")).as("hs"), col("n")).groupBy()
          .agg(GraftFunctions.cms_sketch_weighted(col("hs"), col("n"),
            CmsDepth, CmsWidth))
          .collect().head.getSeq[Long](0)
        val cmsWeightedOk = wgot == cref.toSeq
        bloomOk && hllOk && cmsOk && cmsWeightedOk
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: kmv_sketch equals the JVM k-min-of-distinct fold under " +
      "arbitrary partitioning and is duplicate-insensitive") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    val wordGen = Gen.alphaNumStr.map(w => if (w.isEmpty) "x" else w.take(6))
    def md5Hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val prop = Prop.forAll(
      Gen.listOfN(40, wordGen), Gen.chooseNum(1, 7)) { (ws, nPart) =>
      def kmvOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
        df.repartition(nPart).groupBy()
          .agg(GraftFunctions.kmv_sketch(md5(col("w")), 8))
          .collect().head.getSeq[String](0)
      val df = ws.toDF("w")
      val ref = ws.map(md5Hex).distinct.sorted.take(8)
      kmvOf(df) == ref && kmvOf(df.union(df)) == ref
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("GraftExtensions injects the function set at session-build time") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    // the injected builders must construct working expressions
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, StringType}
    val words = Literal.create(
      new GenericArrayData(Array[Any](
        org.apache.spark.unsafe.types.UTF8String.fromString("hello"))),
      ArrayType(StringType))
    val sig = graft.functions.SimHash32Expr(words).eval(null)
    assert(sig.toString.length == 32 && sig.toString.forall("01".contains(_)))
    // the round-9 additions ride the same surface: nfc composes at
    // builder-injection time too
    val nfcOut = graft.functions.NfcNormalizeExpr(
      Literal.create(
        org.apache.spark.unsafe.types.UTF8String.fromString("café"),
        StringType)).eval(null)
    assert(nfcOut.toString == "café")
  }

  test("kernels register as SQL functions") {
    GraftFunctions.register(spark)
    docs.createOrReplaceTempView("hk_docs")
    val r = spark.sql(
      """SELECT simhash32(ws) AS sig, min_md5(sh) AS mm,
        |       shingle_hash32(sh) AS hh FROM hk_docs LIMIT 1""".stripMargin)
      .collect()
    assert(r.length == 1 && r.head.getString(0).length == 32)
  }

  test("nfc kernel: codegen and interpreted paths agree; SQL-registered; " +
      "matches java.text.Normalizer on adversarial unicode") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val cases = Seq("", "ascii", "caf\u00e9", "cafe\u0301",
      "\u1100\u1161\u11a8", "\ufb01le", "A\u030aB\u0301",
      "mixed ascii cafe\u0301 tail", "\uac01")
    val df = cases.toDF("s")
      .withColumn("n", GraftFunctions.nfc(col("s")))
    // (whole-stage codegen path -- the default planner output)
    val viaDf = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { c =>
      val expect = java.text.Normalizer
        .normalize(c, java.text.Normalizer.Form.NFC)
      assert(viaDf(c) == expect,
        s"codegen diverged on ${c.codePoints().toArray.toSeq}")
      // interpreted eval (nullSafeEval) must agree with codegen
      val interp = graft.functions.NfcNormalizeExpr.nfc(
        org.apache.spark.unsafe.types.UTF8String.fromString(c)).toString
      assert(interp == expect)
    }
    val sqlOut = spark.sql("SELECT nfc('cafe\u0301') AS n")
      .collect()(0).getString(0)
    assert(sqlOut == "caf\u00e9")
  }
}
