package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.tools.SchemaGate

/** The schema gate can refuse an entire correctness round, so its
  * footer-reading, snapshot round-trip, and fatal/warn policy get their
  * own pins against the real testdata.
  */
class SchemaGateSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  test("footer schemas read all tables with column-level detail") {
    val schemas = SchemaGate.footerSchemas(sfDir)
    assert(schemas.contains("lineitem") && schemas.contains("documents") &&
      schemas.contains("events") && schemas.contains("embeddings"))
    // normalized one-line form, with the physical types visible
    schemas.values.foreach { s =>
      assert(s.startsWith("message") && !s.contains("\n"))
    }
    assert(schemas("events").contains("ts"))
  }

  test("snapshot round-trip: write → check passes; doctored type → check throws naming the column") {
    val dir = Files.createTempDirectory("graft_schema_gate").toString
    val snap = s"$dir/snap.json"
    SchemaGate.writeSnapshot(sfDir, snap)
    SchemaGate.check(sfDir, snap) // must not throw

    // doctor ONE column's physical type in the snapshot (the r8 incident
    // shape: events.ts re-typed) and expect a fatal, named refusal
    val txt = Files.readString(Paths.get(snap))
    val doctored =
      if (txt.contains("int64 ts")) txt.replace("int64 ts", "int32 ts")
      else txt.replace("ts ", "ts_doctored ") // fallback: rename → REMOVED
    assert(doctored != txt, "fixture assumption broken: events.ts not found")
    Files.writeString(Paths.get(snap), doctored)
    val e = intercept[IllegalStateException] { SchemaGate.check(sfDir, snap) }
    assert(e.getMessage.contains("SCHEMA DRIFT"))
    assert(e.getMessage.contains("events") || e.getMessage.contains("ts"))
  }

  test("group (LIST) columns key by NAME — a re-typed list element is fatal and named") {
    val dir = Files.createTempDirectory("graft_schema_gate3").toString
    val snap = s"$dir/snap.json"
    SchemaGate.writeSnapshot(sfDir, snap)
    // re-type the embedding list element float → double inside the group
    val txt = Files.readString(Paths.get(snap))
    assert(txt.contains("optional float element"), "fixture assumption broken")
    Files.writeString(Paths.get(snap),
      txt.replace("optional float element", "optional double element"))
    val e = intercept[IllegalStateException] { SchemaGate.check(sfDir, snap) }
    // the message must name the COLUMN (embedding), not its annotation —
    // the mis-keyed parser reported group columns as "(LIST)" and two
    // such columns in one table would have collided silently
    assert(e.getMessage.contains("embeddings.embedding"), e.getMessage.take(300))
  }

  test("new tables and absent snapshot only warn — a benign difference must not nuke a round") {
    val dir = Files.createTempDirectory("graft_schema_gate2").toString
    val snap = s"$dir/snap.json"
    // snapshot taken from a SUBSET dir: current data then has "new" tables
    val sub = Files.createDirectory(Paths.get(s"$dir/sub"))
    Files.copy(Paths.get(s"$sfDir/region.parquet"), Paths.get(s"$sub/region.parquet"))
    SchemaGate.writeSnapshot(sub.toString, snap)
    SchemaGate.check(sfDir, snap) // extra tables in sfDir → warn only, no throw
    // absent snapshot → notice, no throw
    SchemaGate.check(sfDir, s"$dir/nonexistent.json")
  }
}
