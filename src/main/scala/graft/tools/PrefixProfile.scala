package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Dedup

/** One-off stage profile of prefixFilterPairs at sf0.1 (informs the plan
  * notes; not part of the gate).
  */
object PrefixProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables(spark, "/root/testdata/sf0.1", "documents")
    def t[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pp] $what: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val sh = t("shingleCk+explode count") {
      val compact = docs
        .select(col("doc_id"), Dedup.tokens(col("text")).as("w"))
        .select(col("doc_id"), graft.functions.wordShingles(col("w"), 3).as("sh"))
        .localCheckpoint(true)
      val s = compact.select(col("doc_id"), size(col("sh")).as("n_sh"),
        explode(col("sh")).as("s"))
      s.count(); s
    }
    println("[pp] sh rows: " + sh.count())
    val dfreq = sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
    t("dfreq count")(println("[pp] vocab: " + dfreq.count()))
    val pref = sh.join(dfreq, "s")
      .groupBy(col("doc_id"))
      .agg(first(col("n_sh")).as("n_sh"),
        sort_array(collect_list(struct(col("df"), col("s")))).as("o"))
      .select(col("doc_id"), col("n_sh"),
        posexplode(slice(col("o"), lit(1),
          (col("n_sh") - ceil(lit(0.5) * col("n_sh")) + 1)
            .cast(org.apache.spark.sql.types.IntegerType))))
      .select(col("doc_id"), col("n_sh"), (col("pos") + 1).as("i"),
        col("col.s").as("s"))
    t("prefix rows")(println("[pp] prefix rows: " + pref.count()))
    val raw = pref.select(col("doc_id").as("doc_a"), col("n_sh").as("na"),
        col("i").as("ia"), col("s"))
      .join(pref.select(col("doc_id").as("doc_b"), col("n_sh").as("nb"),
        col("i").as("ib"), col("s")), "s")
      .filter(col("doc_a") < col("doc_b"))
    t("raw match rows")(println("[pp] raw: " + raw.count()))
    val cand = raw
      .filter(least(col("na") - col("ia"), col("nb") - col("ib")) + 1 >=
        ceil(lit(0.5 / 1.5) * (col("na") + col("nb"))))
      .select(col("doc_a"), col("doc_b")).distinct()
    t("cand pairs")(println("[pp] cand: " + cand.count()))
    val out = Dedup.prefixFilterPairs(docs, 0.5)
    t("full op")(println("[pp] out: " + out.count()))
    spark.stop()
  }
}
