package graft.tools

import graft.functions.VectorFunctions
import graft.index.VectorIndex
import graft.search.Knn
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev drive: exercises the library end-to-end on the sf0.001 fixtures.
  * Usage: sbt "runMain graft.tools.Drive [sfDir]"
  */
object Drive {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    VectorFunctions.register(spark)

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = emb.where(col("vec_id") === 7).select(col("embedding")).head
      .getSeq[Float](0).toArray

    println("== topKWithScore k=3 (query = vec_id 7's own embedding) ==")
    Knn.topKWithScore(emb, q, 3, idCol = "vec_id")
      .select("vec_id", "label", "dist").show(false)

    println("== topKFiltered label=3 k=2 ==")
    Knn.topKFiltered(emb, q, 2, col("label") === 3, idCol = "vec_id")
      .select("vec_id", "label", "dist").show(false)

    println("== hierarchical coarse=3 fine=2 over label ==")
    Knn.hierarchical(emb, q, sectionCol = "label", idCol = "vec_id")
      .select("label", "vec_id", "dist", "rank").show(false)

    println("== normalizeScores on top-3 ==")
    Knn.normalizeScores(Knn.topKWithScore(emb, q, 3, idCol = "vec_id"))
      .select("vec_id", "dist", "importance_pct").show(false)

    println("== dimension-mismatch probe (should raise) ==")
    try {
      emb.select(VectorFunctions.l2Distance(
        col("embedding"), typedlit(Array(1.0f, 2.0f)))).show(1)
      println("!! NO ERROR RAISED — BUG")
    } catch {
      case e: Throwable =>
        println(s"raised as expected: ${e.getClass.getSimpleName}: " +
          Option(e.getMessage).getOrElse("").linesIterator.take(3).mkString(" | "))
    }

    println("== VectorIndex.build on documents (EP1 pipeline) ==")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val index = VectorIndex.build(docs)
    index.cache()
    println(s"index rows: ${index.count()}")
    println(s"distinct chunk_id: ${index.select("chunk_id").distinct().count()}")
    index.show(3, 60)

    spark.stop()
  }
}
