package graft.tools

/** Targeted Verify: dump only the named catalog queries (plus
  * oracle_sql.json) to outDir, via the SAME dump implementation as the
  * full gate (graft.Verify.dump — session conf, failure handling and
  * `{OUT}` substitution cannot drift). Together with
  * `tools/check_oracle.py SF OUT name...` this makes the per-round sf0.1
  * scale-robustness replay of CHANGED oracles cheap instead of a full
  * catalog dump + full DuckDB suite.
  *
  * Usage: runMain graft.tools.DumpQuery SF_DIR OUT_DIR name [name...]
  * Queries whose oracle reads `{OUT}` aux inputs need those aux dumps
  * too — pass the aux names explicitly (listed in SparkEntry.auxDumps). */
object DumpQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: DumpQuery SF_DIR OUT_DIR name [name...]")
    val spark = graft.Verify.session()
    graft.Verify.dump(spark, args(0), args(1), Some(args.drop(2).toSeq))
    spark.stop()
  }
}
