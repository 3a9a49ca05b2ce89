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
}
