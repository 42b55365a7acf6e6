package graft

import org.apache.spark.sql.functions._
import graft.etl.Tables

/** `Tables.jdbc` against the in-memory Derby that ships on Spark's
  * classpath — the O1 linked-server modality as a real `spark.read.jdbc`
  * round trip: plain table read, remote-pushdown subquery, and a bounded
  * partitioned parallel read (the fact-sized pull shape). Derby runs
  * embedded in this JVM, which is exactly where local[2] executors live,
  * so the partitioned read exercises real per-partition JDBC cursors. */
class JdbcSpec extends SparkSpec {

  // derby.stream.error.file is set as a forked-JVM system property in
  // build.sbt — a class-body setProperty here would only win if this
  // suite happened to initialize before the Derby driver's first load
  private val url = "jdbc:derby:memory:graftjdbc;create=true"

  private def seed(): Unit = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val meta = conn.getMetaData.getTables(null, null, "DIM_CLIENT", null)
      val exists = meta.next()
      meta.close()
      if (!exists) {
        val st = conn.createStatement()
        st.execute("CREATE TABLE dim_client (" +
          "id INT PRIMARY KEY, name VARCHAR(40), spend DECIMAL(18,4))")
        val ps = conn.prepareStatement(
          "INSERT INTO dim_client VALUES (?, ?, ?)")
        for (i <- 1 to 100) {
          ps.setInt(1, i)
          ps.setString(2, s"client_$i")
          ps.setBigDecimal(3, new java.math.BigDecimal(i * 10))
          ps.addBatch()
        }
        ps.executeBatch()
        st.close()
      }
    } finally conn.close()
  }

  test("plain table read preserves rows and types") {
    seed()
    val df = Tables.jdbc(spark, url, "dim_client")
    assert(df.count() == 100)
    assert(df.schema("SPEND").dataType ==
      org.apache.spark.sql.types.DecimalType(18, 4))
    assert(df.agg(sum(col("ID"))).first().getLong(0) == 5050L)
  }

  test("pushdown subquery executes remotely (the linked-server idiom)") {
    seed()
    val q = Tables.jdbc(spark, url,
      "(SELECT id, name FROM dim_client WHERE id <= 10) t")
    assert(q.count() == 10)
    assert(q.columns.toSeq.map(_.toUpperCase) == Seq("ID", "NAME"))
  }

  test("writeJdbc round-trips a snapshot through Derby, decimals intact") {
    val df = spark.range(1, 51).select(col("id").cast("int").as("id"),
      concat(lit("n"), col("id")).as("name"),
      (col("id") * 2).cast("decimal(18,4)").as("spend"))
    Tables.writeJdbc(df, url, "egress_snapshot")
    val back = Tables.jdbc(spark, url, "egress_snapshot")
    assert(back.count() == 50)
    assert(back.agg(sum(col("ID"))).first().getLong(0) == 1275L)
    assert(back.schema.find(_.name.equalsIgnoreCase("spend")).get.dataType ==
      org.apache.spark.sql.types.DecimalType(18, 4))
    // overwrite replaces, not appends
    Tables.writeJdbc(df.limit(10), url, "egress_snapshot")
    assert(Tables.jdbc(spark, url, "egress_snapshot").count() == 10)
  }

  test("bounded partitioned read splits into parallel range cursors") {
    seed()
    val pdf = Tables.jdbc(spark, url, "dim_client",
      partitionColumn = Some("id"), bounds = Some((1L, 100L)),
      numPartitions = 4)
    assert(pdf.rdd.getNumPartitions == 4)
    // every row lands in exactly one range partition — no loss, no dup
    assert(pdf.count() == 100)
    assert(pdf.agg(sum(col("ID"))).first().getLong(0) == 5050L)
  }
}
