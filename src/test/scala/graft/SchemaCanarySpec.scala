package graft

/** Schema canary: the exact Spark-visible column types every gate query
  * assumes, per driver table. The driver REGENERATES the testdata between
  * rounds and has already changed physical types once (`events.ts`
  * TIMESTAMP(NANOS) → timestamp[us], which broke five suites at once
  * with confusing per-query errors) — this spec exists so the NEXT drift
  * fails as one pointed diff instead. If a failure here is intentional
  * driver drift, absorb it at the `Tables` loader seam (the way
  * `normalizeEventTs` does) and update the contract below.
  */
class SchemaCanarySpec extends SparkSpec {

  private val expected: Map[String, Seq[(String, String)]] = Map(
    "region" -> Seq("r_regionkey" -> "int", "r_name" -> "string"),
    "nation" -> Seq("n_nationkey" -> "int", "n_name" -> "string",
      "n_regionkey" -> "int"),
    "customer" -> Seq("c_custkey" -> "bigint", "c_name" -> "string",
      "c_nationkey" -> "int", "c_acctbal" -> "double",
      "c_mktsegment" -> "string"),
    "supplier" -> Seq("s_suppkey" -> "bigint", "s_name" -> "string",
      "s_nationkey" -> "int", "s_acctbal" -> "double"),
    "part" -> Seq("p_partkey" -> "bigint", "p_name" -> "string",
      "p_brand" -> "string", "p_type" -> "string", "p_size" -> "int",
      "p_retailprice" -> "double"),
    "orders" -> Seq("o_orderkey" -> "bigint", "o_custkey" -> "bigint",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> "timestamp_ntz", "o_orderpriority" -> "string"),
    "lineitem" -> Seq("l_orderkey" -> "bigint", "l_partkey" -> "bigint",
      "l_suppkey" -> "bigint", "l_linenumber" -> "int",
      "l_quantity" -> "double", "l_extendedprice" -> "double",
      "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      "l_shipdate" -> "timestamp_ntz"),
    // ts here is POST-normalization (Tables.events → epoch-µs long); the
    // raw physical layout is allowed to drift, the loaded contract is not
    "events" -> Seq("event_id" -> "bigint", "ts" -> "bigint",
      "user_id" -> "bigint", "event_type" -> "string",
      "value" -> "double", "props" -> "string"),
    "documents" -> Seq("doc_id" -> "bigint", "text" -> "string",
      "lang" -> "string", "source" -> "string", "n_chars" -> "bigint"),
    "embeddings" -> Seq("vec_id" -> "bigint",
      "embedding" -> "array<float>", "label" -> "int"))

  test("driver tables load with the exact column types the queries assume") {
    val diffs = Tables.all.flatMap { name =>
      val df =
        if (name == "events") Tables.events(spark, sf0001)
        else Tables.load(spark, sf0001, name)
      val got = df.schema.fields.map(f => f.name -> f.dataType.simpleString).toSeq
      if (got == expected(name)) None
      else Some(s"$name:\n  expected ${expected(name)}\n  got      $got")
    }
    assert(diffs.isEmpty,
      "driver testdata schema drift (absorb at the Tables loader seam, " +
        "see scaladoc):\n" + diffs.mkString("\n"))
  }
}
