package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** ConsumerConfig parsing — the HOCON-text form must accept a
  * reference.conf-shaped document (reference: src/main/resources/
  * reference.conf:9-19) for each of the three initial positions.
  */
class ConsumerConfigSpec extends AnyFunSuite {

  private def conf(position: String): String =
    s"""# consumer settings
       |kinesis {
       |  stream-name = "events-replay"   // the stream locator
       |  application-name: graft-it
       |  shards = 8
       |  position {
       |    initial = $position
       |    time = 1700000000000
       |  }
       |  max-records-per-trigger = 500
       |  delivery-mode = at-most-once
       |}
       |""".stripMargin

  private def parse(position: String): ConsumerConfig = {
    // the reference scopes keys under its own root; fromMap takes the
    // flattened keys relative to that root
    val flat = Hocon.flatten(conf(position)).map {
      case (k, v) => k.stripPrefix("kinesis.") -> v
    }
    ConsumerConfig.fromMap(flat)
  }

  test("parses a reference.conf-shaped document (all three positions)") {
    val latest = parse("latest")
    assert(latest.streamPath === "events-replay")
    assert(latest.appName === "graft-it")
    assert(latest.numShards === 8)
    assert(latest.startingPosition === "latest")
    assert(latest.maxRecordsPerTrigger === Some(500L))
    assert(latest.deliveryMode === "at_most_once")
    assert(parse("trim-horizon").startingPosition === "trim_horizon")
    val ts = parse("at-timestamp")
    assert(ts.startingPosition === "at_timestamp")
    assert(ts.startingTimestampMs === Some(1700000000000L))
  }

  test("fromHocon parses an unscoped document directly") {
    val c = ConsumerConfig.fromHocon(
      """stream-name = s
        |position.initial = trim-horizon
        |reshard-at-ms = 42
        |""".stripMargin)
    assert(c.streamPath === "s")
    assert(c.startingPosition === "trim_horizon")
    assert(c.reshardAtMs === Some(42L))
    assert(c.deliveryMode === "at_least_once")
  }

  test("comments inside quotes survive; unbalanced braces are rejected") {
    val m = Hocon.flatten("""name = "a # not a comment" """)
    assert(m("name") === "a # not a comment")
    intercept[IllegalArgumentException](Hocon.flatten("a {\n b = 1\n"))
    intercept[IllegalArgumentException](Hocon.flatten("}\n"))
  }
}
