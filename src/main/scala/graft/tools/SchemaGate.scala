package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile

/** Scala-side testdata schema tripwire, wired into the correctness gate
  * itself (`Verify.main` calls [[check]] before running a single query).
  *
  * `tools/lint_schema_drift.py` protects the verify RECIPE; this protects
  * the GATE: two driver-side testdata regenerations (r7 HUGEINT widening,
  * r8 TIMESTAMP(NANOS) → timestamp[us]) shipped rounds whose artifacts
  * compared engine output against silently re-typed parquet. The gate now
  * refuses to run — with a message naming each re-typed column — instead
  * of producing 149 confusing hash mismatches.
  *
  * Physical types come straight from the parquet footer
  * (`ParquetFileReader`, on the classpath via Spark's jars), so the check
  * sees what the file actually stores, before any Spark read-boundary
  * normalization (`Tables.events`) could mask a re-type.
  *
  * Policy: a CHANGED type on a column present in the snapshot is fatal
  * (that is the hazard — every oracle compare would be against different
  * physics); NEW tables/columns and absent tables only warn (an sf dir
  * with extra tables must not nuke the round).
  *
  * Snapshot refresh (after re-running the full gate):
  * `sbt "runMain graft.tools.SchemaGate /root/testdata/sf0.01 --update"`
  */
object SchemaGate {

  val snapshotPath = "tools/testdata_schemas_parquet.json"

  /** table name → one-line normalized parquet footer schema. */
  def footerSchemas(sfDir: String): Map[String, String] = {
    val dir = new java.io.File(sfDir)
    val files = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).sortBy(_.getName)
    val conf = new Configuration()
    files.map { f =>
      val in = HadoopInputFile.fromPath(new Path(f.getAbsolutePath), conf)
      val r = ParquetFileReader.open(in)
      val schema =
        try r.getFooter.getFileMetaData.getSchema.toString
        finally r.close()
      // MessageType.toString is multi-line; normalize to one line so the
      // snapshot diffs cleanly and JSON stays single-line-per-table
      f.getName.stripSuffix(".parquet") -> schema.replaceAll("\\s+", " ").trim
    }.toMap
  }

  /** Per-column map parsed from the normalized schema line: the fatal/warn
    * split needs column granularity, and MessageType's grammar is simple
    * (`required|optional|repeated TYPE name ...;` at depth 1).
    */
  private def columns(schema: String): Map[String, String] = {
    // fields are `;`-separated inside the outer `message X { ... }`
    val body = schema.substring(schema.indexOf('{') + 1, schema.lastIndexOf('}'))
    // split at top nesting depth only (list/map columns nest groups)
    val fields = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0; val sb = new StringBuilder
    body.foreach {
      case '{' => depth += 1; sb.append('{')
      case '}' => depth -= 1; sb.append('}')
        if (depth == 0) { fields += sb.toString.trim; sb.clear() }
      case ';' if depth == 0 => fields += sb.toString.trim; sb.clear()
      case c => sb.append(c)
    }
    fields.filter(_.nonEmpty).map { f =>
      // declaration heads: `<rep> <primitive> name (ANN) ...` for leaves,
      // `<rep> group name (LIST) { ... }` for nested columns. For a group
      // the name directly follows the `group` keyword (there is no
      // primitive-type token), so keying on "token after the type" would
      // mis-key every group column as its annotation — two LIST columns
      // in one table would then collide in the Map and a re-type of the
      // first would be invisible to the fatal check.
      val head = f.takeWhile(c => c != '{').trim
      val toks = head.split("\\s+")
      val gi = toks.indexOf("group")
      val name =
        if (gi >= 0 && gi + 1 < toks.length) toks(gi + 1)
        else {
          val typeIdx = toks.indexWhere(t =>
            !Set("required", "optional", "repeated").contains(t) &&
              !t.startsWith("(") && !t.startsWith("="))
          if (typeIdx >= 0 && typeIdx + 1 < toks.length &&
            !toks(typeIdx + 1).startsWith("(") && !toks(typeIdx + 1).startsWith("="))
            toks(typeIdx + 1)
          else toks.last
        }
      name -> f
    }.toMap
  }

  /** Throws IllegalStateException on a changed physical type; prints
    * warnings for benign differences; no-op with a notice when the
    * snapshot file is absent (the python lint owns the louder
    * missing-snapshot failure for the recipe path — the gate must not be
    * un-runnable on a fresh checkout that predates the snapshot).
    */
  def check(sfDir: String, snapshot: String = snapshotPath): Unit = {
    if (sys.env.get("SPARK_GRAFT_SKIP_SCHEMA_GATE").contains("1")) {
      System.err.println("[schema-gate] SKIPPED via SPARK_GRAFT_SKIP_SCHEMA_GATE=1")
      return
    }
    val p = Paths.get(snapshot)
    if (!Files.exists(p)) {
      System.err.println(s"[schema-gate] snapshot $snapshot absent — " +
        "gate runs unprotected; regenerate with runMain graft.tools.SchemaGate <sfdir> --update")
      return
    }
    val want = parseJson(Files.readString(p))
    val got = footerSchemas(sfDir)
    val fatal = scala.collection.mutable.ArrayBuffer.empty[String]
    (want.keySet ++ got.keySet).toSeq.sorted.foreach { t =>
      (want.get(t), got.get(t)) match {
        case (Some(w), Some(g)) if w != g =>
          val wc = columns(w); val gc = columns(g)
          (wc.keySet ++ gc.keySet).toSeq.sorted.foreach { c =>
            (wc.get(c), gc.get(c)) match {
              case (Some(a), Some(b)) if a != b =>
                fatal += s"$t.$c: snapshot[$a] != current[$b]"
              case (Some(a), None) => fatal += s"$t.$c: column REMOVED (was [$a])"
              case (None, Some(_)) =>
                System.err.println(s"[schema-gate] note: new column $t.$c")
              case _ => ()
            }
          }
        case (Some(_), None) =>
          System.err.println(s"[schema-gate] note: table $t absent in $sfDir")
        case (None, Some(_)) =>
          System.err.println(s"[schema-gate] note: new table $t in $sfDir")
        case _ => ()
      }
    }
    if (fatal.nonEmpty) {
      val msg = "TESTDATA SCHEMA DRIFT — physical parquet types changed since " +
        s"the committed snapshot ($snapshot):\n" +
        fatal.map("  " + _).mkString("\n") +
        "\nThe correctness gate refuses to run against re-typed testdata: " +
        "every DuckDB compare would be against different physics. " +
        "Fix read boundaries if needed, re-run the full gate manually, then " +
        "refresh: sbt \"runMain graft.tools.SchemaGate " + sfDir + " --update\""
      throw new IllegalStateException(msg)
    }
    println(s"[schema-gate] OK (${got.size} tables match $snapshot)")
  }

  // minimal flat {"k":"v",...} JSON codec — the snapshot is written and
  // read only by this object, so no general parser is needed
  private def esc(s: String) = s.flatMap {
    case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
    case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
  }
  private def parseJson(s: String): Map[String, String] = {
    val m = scala.collection.mutable.Map.empty[String, String]
    var i = 0
    def string(): String = {
      val sb = new StringBuilder
      i += 1 // opening quote
      while (s(i) != '"') {
        if (s(i) == '\\') {
          i += 1
          s(i) match {
            case 'n' => sb.append('\n'); case 't' => sb.append('\t')
            case 'r' => sb.append('\r')
            case 'u' => sb.append(Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar); i += 4
            case c => sb.append(c)
          }
        } else sb.append(s(i))
        i += 1
      }
      i += 1
      sb.toString
    }
    while (i < s.length) {
      if (s(i) == '"') {
        val k = string()
        while (s(i) != '"') i += 1
        m(k) = string()
      } else i += 1
    }
    m.toMap
  }

  /** Write the snapshot for `sfDir` to `path` (used by --update and specs). */
  def writeSnapshot(sfDir: String, path: String): Unit = {
    val schemas = footerSchemas(sfDir)
    val json = schemas.toSeq.sortBy(_._1)
      .map { case (k, v) => s"""  "${esc(k)}": "${esc(v)}"""" }
      .mkString("{\n", ",\n", "\n}\n")
    Files.writeString(Paths.get(path), json)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    if (args.contains("--update")) {
      writeSnapshot(sfDir, snapshotPath)
      println(s"snapshot written: $snapshotPath")
    } else check(sfDir)
  }
}
