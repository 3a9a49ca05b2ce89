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
}
