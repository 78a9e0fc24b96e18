package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite {

  private val spark = graft.SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("saltedJoin is row-for-row equal to the plain equi-join") {
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_quantity")
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_orderstatus")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    val plain = lineitem.join(orders, "l_orderkey")
      .select("l_orderkey", "l_partkey", "l_quantity", "o_orderstatus")
    val salted = Skew.saltedJoin(lineitem, orders, "l_orderkey", salts = 4)
      .select("l_orderkey", "l_partkey", "l_quantity", "o_orderstatus")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("keyHistogram surfaces the hottest keys in order") {
    val h = Skew.keyHistogram(
      spark.read.parquet(s"$sf/lineitem.parquet"),
      org.apache.spark.sql.functions.col("l_returnflag"), topN = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(h.length == 3)
    assert(h.sortBy(-_._2).toSeq == h.toSeq) // descending
  }
}
