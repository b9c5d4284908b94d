package graft.plans

import org.apache.spark.sql.SparkSession

import graft.{SparkSpec, TestSpark}

/** QUALIFY SQL-surface parity: the reference's Snowflake dialect ends
  * SELECTs with QUALIFY (workfile_design_data_warehouse.sql:181,265;
  * workfile_ad-hoc_analysis.sql:77,124). GraftSparkExtensions injects
  * graft.plans.QualifyParser so the same clause shapes run under
  * `spark.sql` verbatim. */
class SqlSurfaceSpec extends SparkSpec {

  /** Session with the graft extensions (parser + functions) installed —
    * shares the test SparkContext; the suite-default session is restored
    * immediately so other suites are unaffected. */
  private lazy val qspark: SparkSession = {
    val old = TestSpark.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new graft.functions.GraftSparkExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    SparkSession.setDefaultSession(old)
    SparkSession.setActiveSession(old)
    s
  }

  private def withListings[A](f: => A): A = {
    import qspark.implicits._
    Seq(
      (1L, "f1.csv", "A", 10.0), (1L, "f1.csv", "A", 12.0), // dup key
      (2L, "f1.csv", "A", 30.0),
      (3L, "f2.csv", "B", 20.0), (4L, "f2.csv", "B", 25.0)
    ).toDF("id", "filename", "area", "price").createOrReplaceTempView("listings")
    try f finally qspark.catalog.dropTempView("listings")
  }

  test("rewrite is a no-op without the keyword and rejects DISTINCT") {
    val plain = "SELECT a FROM t WHERE b = 'QUALIFY me not' -- QUALIFY in comment\n"
    assert(QualifySqlRewrite(plain) eq plain)
    intercept[IllegalArgumentException] {
      QualifySqlRewrite("SELECT DISTINCT a FROM t QUALIFY ROW_NUMBER() OVER (ORDER BY a) = 1")
    }
  }

  test("reference shape: keyed row_number dedup (design.sql:265)") {
    withListings {
      val out = qspark.sql(
        """SELECT id, filename, price FROM listings
           QUALIFY row_number() OVER(PARTITION BY id,
               filename ORDER BY price desc) = 1""")
      assert(out.columns.toSeq == Seq("id", "filename", "price"))
      val m = out.collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
      assert(m == Map(1L -> 12.0, 2L -> 30.0, 3L -> 20.0, 4L -> 25.0))
    }
  }

  test("reference shape: RANK top-1 with ORDER BY tail (adhoc.sql:77)") {
    withListings {
      val out = qspark.sql(
        """SELECT area, id, price FROM listings
           QUALIFY RANK() OVER(PARTITION BY area ORDER BY price DESC) = 1
           ORDER BY price DESC, id""")
      assert(out.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
        == Seq(("A", 2L), ("B", 4L)))
    }
  }

  test("reference shape: QUALIFY inside a subquery (adhoc.sql:124)") {
    withListings {
      val out = qspark.sql(
        """SELECT area, count(*) AS n FROM (
             SELECT id, area FROM listings
             QUALIFY row_number() OVER(partition BY id ORDER BY price DESC) = 1
           ) GROUP BY area ORDER BY area""")
      assert(out.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
        == Seq(("A", 2L), ("B", 2L)))
    }
  }

  test("QUALIFY after GROUP BY filters on windows over aggregates") {
    withListings {
      val out = qspark.sql(
        """SELECT area, sum(price) AS total FROM listings
           GROUP BY area
           QUALIFY ROW_NUMBER() OVER (ORDER BY sum(price) DESC) = 1""")
      assert(out.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
        == Seq(("A", 52.0)))
    }
  }

  test("graft_* functions are injected alongside the parser") {
    assert(qspark.sql("SELECT graft_sorted_intersect_count(array('a','b'), array('b','c')) AS n")
      .head().getInt(0) == 1)
  }
}
