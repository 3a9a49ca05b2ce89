package graft

class SqlFunctionsSpec extends SparkSpecBase {

  test("graft functions are callable from SQL after registerAll") {
    GraftSession.prepare(spark)
    val r = spark.sql(
      """SELECT hilbert_index(3, 4, 14) AS h,
        |       morton_index(3, 4, 14) AS m,
        |       minhash(array('a b c', 'b c d'), 8) AS sig,
        |       simhash64(array('tok1', 'tok2', 'tok3')) AS sh
        |""".stripMargin).collect()(0)
    assert(r.getLong(0) === graft.expressions.HilbertIndex.xy2d(14, 3, 4))
    assert(r.getLong(1) === graft.expressions.MortonIndex.interleave(14, 3, 4))
    assert(r.getSeq[Long](2).length === 8)
    assert(r.getLong(3) !== 0L)
  }

  test("porter_stem expression ≡ PorterStemmer.stem through the codegen path") {
    import spark.implicits._
    val words = Seq("caresses", "ponies", "relational",
      "generalizations", "hopping", "sky", "a", "oscillators")
    val got = words.toDF("w")
      .select(graft.functions.porter_stem($"w"))
      .as[String].collect()
    assert(got.toSeq === words.map(graft.text.PorterStemmer.stem))
    // null-safety through the generated code
    val nulls = Seq[Option[String]](Some("falling"), None).toDF("w")
      .select(graft.functions.porter_stem($"w")).collect()
    assert(nulls(0).getString(0) === "fall" && nulls(1).isNullAt(0))
  }

  test("byte_log_units ≡ per-byte floor(c·ln c·1e9+.5) sum via codegen") {
    import spark.implicits._
    def ref(bytes: Array[Byte]): Long =
      bytes.groupBy(b => b & 0xff).values
        .map(g => math.floor(g.length.toDouble *
          math.log(g.length.toDouble) * 1e9 + 0.5).toLong)
        .sum
    val payloads = Seq("aaaa", "abab", "abcd", "", "x",
      new String(Array.tabulate(300)(i => (i % 7 + 'a').toChar)))
      .map(_.getBytes("UTF-8"))
    val got = payloads.toDF("b")
      .select(graft.functions.byte_log_units($"b")).as[Long].collect()
    assert(got.toSeq === payloads.map(ref))
    // full byte range incl. negative JVM bytes (0x80-0xff)
    val bin = Array.tabulate[Byte](512)(i => (i % 256).toByte)
    val one = Seq(bin).toDF("b")
      .select(graft.functions.byte_log_units($"b")).as[Long].collect()
    assert(one(0) === ref(bin))
    val nulls = Seq[Option[Array[Byte]]](Some("zz".getBytes), None)
      .toDF("b").select(graft.functions.byte_log_units($"b")).collect()
    assert(nulls(0).getLong(0) === ref("zz".getBytes) &&
      nulls(1).isNullAt(0))
  }
}
