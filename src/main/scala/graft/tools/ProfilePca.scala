package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProfilePca {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    emb.count()
    def time[A](l: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $l%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val vd = col("embedding").cast("array<double>")
    time("mean decimal agg") {
      emb.select(posexplode(vd).as(Seq("i", "x")))
        .groupBy("i").agg(sum(col("x").cast("decimal(38,30)")).cast("double")).collect()
    }
    val mu = Array.fill(64)(0.0)
    val muLit = typedLit(mu.toSeq)
    val centered = emb.select(transform(vd, (x, i) => x - element_at(muLit, i + 1)).as("c"))
    time("cov decimal agg") {
      centered.select(posexplode(col("c")).as(Seq("i", "xi")), col("c"))
        .select(col("i"), col("xi"), posexplode(col("c")).as(Seq("j", "xj")))
        .groupBy("i", "j")
        .agg(sum((col("xi") * col("xj")).cast("decimal(38,30)")).cast("double")).collect()
    }
    time("cov double agg") {
      centered.select(posexplode(col("c")).as(Seq("i", "xi")), col("c"))
        .select(col("i"), col("xi"), posexplode(col("c")).as(Seq("j", "xj")))
        .groupBy("i", "j").agg(sum(col("xi") * col("xj"))).collect()
    }
    val model = time("full pcaTrain") {
      graft.operators.Similarity.pcaTrain(emb, 3)
    }
    time("project+count") {
      graft.operators.Similarity.pcaProject(emb, model).count()
    }
    spark.stop()
  }
}
