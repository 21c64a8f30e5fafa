package graft

class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("custom expressions are callable from SQL after registration") {
    GraftExtensions.register(spark)
    Seq((1L, "the quick brown fox the quick")).toDF("id", "text")
      .createOrReplaceTempView("ext_docs")

    val sh = spark.sql(
      "SELECT simhash64(split(text, ' ')) AS f FROM ext_docs").as[Long].head()
    assert(sh != 0L)

    val dp = spark.sql(
      "SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d").as[Double].head()
    assert(dp == 11.0)

    val grams = spark.sql(
      "SELECT word_shingles(split(text, ' '), 2) AS g FROM ext_docs").as[Seq[String]].head()
    assert(grams.contains("the quick") && grams.contains("quick brown"))
    assert(grams.count(_ == "the quick") == 1) // distinct

    val tb = spark.sql(
      """SELECT CAST(time_bucket_fixed(TIMESTAMP '2024-01-01 08:22:11', '15m') AS STRING) AS b,
                CAST(time_bucket_fixed(TIMESTAMP '2024-01-01 08:22:11', '15 minutes') AS STRING) AS b2""")
      .as[(String, String)].head()
    assert(tb._1 == "2024-01-01 08:15:00" && tb._2 == tb._1)

    // round-3 additions: signature, winnowing, and LSH bucket from SQL
    val sig = spark.sql(
      "SELECT minhash_sig(word_shingles(split(text, ' '), 3), 8) AS s FROM ext_docs")
      .as[Seq[Long]].head()
    assert(sig.length == 8 && sig.forall(_ >= 0))
    val fp = spark.sql(
      "SELECT winnow(split('a b c d e f g h i j', ' '), 4, 4) AS w").as[Seq[Long]].head()
    assert(fp.nonEmpty)
    val hb = spark.sql(
      "SELECT hyperplane_bucket(array(1.0D, 0.0D), 2, 4) AS b").as[Int].head()
    assert(hb >= 0 && hb < 16)
    // seed-stable across calls
    val hb2 = spark.sql(
      "SELECT hyperplane_bucket(array(1.0D, 0.0D), 2, 4) AS b").as[Int].head()
    assert(hb == hb2)

    val tk = spark.sql(
      """SELECT topk_items(x, 1, 8) AS t
         FROM VALUES ('a'), ('b'), ('a') AS v(x)""").head().getSeq[Any](0)
    assert(tk.length == 1)

    // compressibility: repetitive text compresses far below mixed text
    val cr = spark.sql(
      """SELECT compress_ratio(repeat('spam ham ', 200)) AS rep,
                compress_ratio('') AS empty""").as[(Double, Double)].head()
    assert(cr._1 < 0.1 && cr._2 == 1.0)

    // round-7 codecs: round-trip identity and grid compression from SQL
    val codec = spark.sql(
      """SELECT dd_decode(dd_encode(g)) = g AS ddok,
                gorilla_decode(gorilla_encode(p)) = p AS gok,
                length(dd_encode(g)) < 8 * size(g) AS packs
         FROM (SELECT transform(sequence(0, 23),
                        i -> 1700000000000000L + i * 3600000000L) AS g,
                      transform(sequence(0, 23), i -> 100.0D + i % 4) AS p)""")
      .as[(Boolean, Boolean, Boolean)].head()
    assert(codec == ((true, true, true)))
  }

  test("session built with extensions class resolves the functions") {
    // simulate spark.sql.extensions wiring on a fresh session in the
    // same JVM (shares context, separate state)
    val s2 = spark.newSession()
    GraftExtensions.register(s2)
    assert(s2.sql("SELECT dot_product(array(1.0D), array(2.0D))").head().getDouble(0) == 2.0)
  }
}
