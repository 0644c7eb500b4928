package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object HtmlProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def time(name: String, html: String): Unit = {
      val df = Seq(html).toDF("html")
      val t0 = System.nanoTime()
      new graft.text.HtmlTextExtractor().setInputCol("html")
        .setOutputCol("o").transform(df)
        .select(length(col("o"))).head()
      println(f"$name%-28s len=${html.length}%8d  ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    // benign long page
    time("benign 1MB", ("<p>" + ("word " * 30) + "</p>\n") * 6000)
    // pathological: unclosed comments (non-greedy .*? rescans to EOF)
    time("unclosed comments 100KB", "<!-- x " * 14000)
    time("unclosed comments 300KB", "<!-- x " * 42000)
    // pathological: unclosed script opens
    time("unclosed scripts 100KB", "<script> y " * 9000)
    time("unclosed scripts 300KB", "<script> y " * 27000)
    spark.stop()
  }
}
