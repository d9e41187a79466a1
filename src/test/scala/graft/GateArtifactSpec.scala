package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite

/** Self-enforcing closing gate (VERDICT r8 "Next #2"): the committed
  * full-surface bench artifact must cover EVERY registered query.
  *
  * Three rounds (r5 q333, r6 q340/q341, r8 q363) shipped a red artifact
  * because a QueryDef was registered after the round's last verification
  * run. `tools/closing_gate.sh` mechanizes the verification, but r8
  * proved the gate itself can be skipped — so this spec makes the skip
  * visible in `sbt test` at HEAD: registering a new query without
  * re-running the gate (which regenerates `bench/BENCH_FULL_r<N>.json`
  * BEFORE the suite runs — see the script's step order) turns the suite
  * red by construction.
  *
  * Mid-round, a red result here is the expected reminder that the gate
  * is still owed; the round's ship condition is this spec green at HEAD.
  */
class GateArtifactSpec extends AnyFunSuite {

  private val benchRe = "BENCH_FULL_r(\\d+)\\.json".r

  private def newest: Option[(Int, String)] = {
    val dir = Paths.get("bench")
    if (!Files.isDirectory(dir)) None
    else Files.list(dir).iterator.asScala
      .flatMap { p =>
        p.getFileName.toString match {
          case benchRe(n) => Some((n.toInt, p.toString))
          case _ => None
        }
      }
      .toSeq.sortBy(-_._1).headOption
  }

  test("the newest full-surface bench artifact covers every registered query") {
    val (round, path) = newest.getOrElse(
      fail("no bench/BENCH_FULL_r<N>.json committed — run tools/closing_gate.sh"))
    val text = new String(Files.readAllBytes(Paths.get(path)), "UTF-8")
    // One JSON line; the "queries" object's keys are the benched names.
    val benched = "\"(q\\d+_[A-Za-z0-9_]+)\"\\s*:".r
      .findAllMatchIn(text).map(_.group(1)).toSet
    val registered = SparkEntry.allDefs.map(_.name).toSet
    val missing = registered.diff(benched)
    assert(missing.isEmpty,
      s"queries registered since bench/BENCH_FULL_r$round.json was " +
        s"generated — run tools/closing_gate.sh for the round (missing: " +
        s"${missing.toSeq.sorted.mkString(", ")})")
  }

  test("the quiet-window headline artifact accompanies the newest bench artifact") {
    val (round, _) = newest.getOrElse(
      fail("no bench/BENCH_FULL_r<N>.json committed — run tools/closing_gate.sh"))
    // The gate runs the headline bench FIRST (r9 VERDICT "Next #4": the
    // driver's own headline window is load-noisy; the committed
    // quiet-start artifact is the arbitration record). Introduced r10.
    if (round >= 10) {
      val p = Paths.get(s"bench/BENCH_HEADLINE_r$round.json")
      assert(Files.exists(p), s"missing $p — run tools/closing_gate.sh $round")
      val text = new String(Files.readAllBytes(p), "UTF-8")
      assert(text.contains("\"loadavg_before\":"),
        s"headline artifact $p lacks the load fields")
    }
  }

  test("the stream drain artifact accompanies the newest bench artifact") {
    val (round, _) = newest.getOrElse(
      fail("no bench/BENCH_FULL_r<N>.json committed — run tools/closing_gate.sh"))
    val p = Paths.get(s"bench/STREAMBENCH_r$round.json")
    assert(Files.exists(p), s"missing $p — run tools/closing_gate.sh $round")
    val text = new String(Files.readAllBytes(p), "UTF-8")
    // Validate the keys StreamBench actually emits (ADVICE r8 medium):
    // {"metric":"stream_drain","records":N,"unbounded_rec_per_sec":N,...}
    assert(text.contains("\"metric\":\"stream_drain\"") &&
      text.contains("\"records\":") &&
      text.contains("\"unbounded_rec_per_sec\":"),
      s"stream artifact $p lacks the stream_drain keys")
  }
}
