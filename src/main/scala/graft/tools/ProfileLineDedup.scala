package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A/B-measure the two ways to pick each line's first occurrence in
  * [[graft.operators.Dedup.dedupLines]] under boilerplate skew:
  *
  *   agg    — min(struct(doc, pos)) per line + join-back (shipped form;
  *            partial-aggregatable, hot lines combine map-side)
  *   window — row_number() over (partition by line order by doc, pos)
  *            (every copy of a hot line lands in ONE partition and sorts)
  *
  * Fixture: `docs` documents × 100 lines; 50 boilerplate lines shared by
  * every doc (each duplicated `docs` times — the skew), 50 unique lines
  * per doc. Throwaway measurement harness; numbers land in SCALE.md.
  *
  * Usage: runMain graft.tools.ProfileLineDedup [nDocs]
  */
object ProfileLineDedup {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(20000)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // (id, pos, line) instance grain, built directly (the explode is
    // common to both forms and not what's under test). Two skew regimes:
    // MODERATE — 50 boilerplate lines, each in every doc; EXTREME — ONE
    // line holds half of all instances (the "click here to continue" of a
    // crawled corpus).
    def fixture(extreme: Boolean) = {
      val df = spark.range(nDocs.toLong).toDF("id")
        .withColumn("pos", explode(sequence(lit(0), lit(99))))
        .withColumn("line",
          when(col("pos") < 50,
            if (extreme) lit("boiler") else concat(lit("boiler-"), col("pos")))
            .otherwise(concat(lit("u-"), col("id"), lit("-"), col("pos"))))
        .cache()
      df.count() // materialize before timing
      df
    }

    def time(name: String)(mk: => DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s best ${ts.min}%6.2f  runs ${ts.map(t => f"$t%.2f").mkString(" ")}")
    }

    Seq(false, true).foreach { extreme =>
      val lines = fixture(extreme)
      val tag = if (extreme) "EXTREME" else "moderate"

      time(s"$tag: agg + join-back") {
        val counts = lines.groupBy("line")
          .agg(min(struct(col("id"), col("pos"))).as("first_occ"))
        lines.join(counts, Seq("line"))
          .filter(col("first_occ.id") === col("id") && col("first_occ.pos") === col("pos"))
          .select("id", "pos", "line")
      }

      time(s"$tag: window row_number") {
        val w = Window.partitionBy("line").orderBy(col("id"), col("pos"))
        lines.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select("id", "pos", "line")
      }
      lines.unpersist()
    }

    spark.stop()
  }
}
