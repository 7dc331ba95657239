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
      expected.get(name) match {
        // a table the driver added but the contract doesn't know: report it
        // as the pointed diff this spec promises, not a NoSuchElementException
        case None => Some(s"$name: no contract entry for this table — the " +
          s"driver added it? got schema $got; add the expected entry above")
        case Some(exp) if got == exp => None
        case Some(exp) => Some(s"$name:\n  expected $exp\n  got      $got")
      }
    }
    assert(diffs.isEmpty,
      "driver testdata schema drift (absorb at the Tables loader seam, " +
        "see scaladoc):\n" + diffs.mkString("\n"))
  }

  test("events.ts raw physical layout pinned; normalized values land in epoch-µs range") {
    // normalizeEventTs DIVIDES any raw Long by 1000 (the nanos layout);
    // a driver generation that ships ts as raw epoch-µs or epoch-ms BIGINT
    // would silently come out 1000–1e6× off, and the post-normalization
    // type check above can't see it (bigint either way). Two guards:
    // the raw physical type is pinned pre-normalization, and the
    // normalized values must be plausible epoch-µs (years 2000–2100) —
    // either trips as one pointed diff whatever the driver ships next.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = Tables.load(spark, sf0001, "events").schema("ts").dataType.simpleString
    assert(raw == "timestamp_ntz",
      s"events.ts RAW physical type drifted to '$raw' (current generation: " +
        "timestamp_ntz = parquet timestamp[us]; nanos generations read as " +
        "bigint under the legacy flag). Verify normalizeEventTs interprets " +
        "the new layout correctly BEFORE updating this pin — a raw epoch-µs " +
        "or epoch-ms bigint would be silently divided by 1000.")
    import org.apache.spark.sql.functions._
    val row = Tables.events(spark, sf0001)
      .agg(min("ts").as("lo"), max("ts").as("hi")).collect().head
    val (lo, hi) = (row.getLong(0), row.getLong(1))
    val us2000 = 946684800000000L // 2000-01-01 in epoch-µs
    val us2100 = 4102444800000000L
    assert(lo >= us2000 && hi <= us2100,
      s"normalized events.ts range [$lo, $hi] is not plausible epoch-µs — " +
        "the raw layout changed scale (µs/ms/ns mixup at the loader seam)")
  }
}
