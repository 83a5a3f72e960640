package graft.cdc

import graft.classifier.{Interactions, SpineMessage}
import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference CSV-parse tests
  * (`tests/unit/domain/spine/test_construct_messages_from_splunk_items.py`)
  * against the change-event content codec.
  */
class MessageParserSpec extends AnyFunSuite {

  test("BST timestamps normalize to UTC (e2e golden: 19:02:29.985 BST → 18:02:29.985)") {
    // tests/e2e/.../2019-12-02-spine_messages.csv:3 → transferParquet.json:8
    val bst = MessageParser.parseTimeMicros("2019-12-02 19:02:29.985 BST")
    val utc = MessageParser.parseTimeMicros("2019-12-02 18:02:29.985 UTC")
    assert(bst == utc)
    val noTz = MessageParser.parseTimeMicros("2019-12-02 18:02:29.985")
    assert(noTz == utc)
  }

  test("null encodings: NONE/empty error → null; NotProvided/empty ref → null") {
    assert(MessageParser.parseErrorCode("NONE").isEmpty)
    assert(MessageParser.parseErrorCode("").isEmpty)
    assert(MessageParser.parseErrorCode("12").contains(12))
    assert(MessageParser.parseMessageRef("NotProvided").isEmpty)
    assert(MessageParser.parseMessageRef("").isEmpty)
    assert(MessageParser.parseMessageRef("abc").contains("abc"))
  }

  test("format/parse round-trips every field") {
    val m = SpineMessage(1577840400123456L, "conv", "guid-1",
      Interactions.ApplicationAck, "asid-a", "asid-b", Some("ref-1"), Some(15),
      Some("EMIS Web"), Some("Vision"))
    assert(MessageParser.parse(MessageParser.format(m)) == m)
    assert(MessageParser.parse(MessageParser.format(m, "BST")) == m)
    // ref/error null-encode; SYSTEM columns pass through verbatim — an
    // empty field parses to Some("") like the reference's DictReader row
    // (message.py:76-77; its e2e goldens show "" suppliers, not null)
    val noOpts = m.copy(messageRef = None, errorCode = None,
      fromSystem = Some(""), toSystem = Some(""))
    assert(MessageParser.parse(MessageParser.format(noOpts)) == noOpts)
  }

  test("fast timestamp path agrees with the formatter across shapes") {
    val shapes = Seq(
      "2019-12-02 19:02:29.985 BST", "2019-12-02 19:02:29.985 UTC",
      "2019-12-02 19:02:29.985123 UTC", "2019-12-02 19:02:29",
      "2024-02-29 00:00:00.1 UTC", "1999-12-31 23:59:59.999999 BST",
      "2020-01-01 00:00:00.000001", "2038-01-19 03:14:07 UTC",
    )
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss[.SSSSSS][.SSS][.S]")
    shapes.foreach { s =>
      val viaParser = MessageParser.parseTimeMicros(s)
      val parts = s.split(" ")
      val (dt, off) =
        if (parts.length == 3 && parts(2) == "BST") (parts(0) + " " + parts(1), 3600000000L)
        else if (parts.length == 3) (parts(0) + " " + parts(1), 0L)
        else (s, 0L)
      val ldt = java.time.LocalDateTime.parse(dt, fmt)
      val expect = ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
        ldt.get(java.time.temporal.ChronoField.MICRO_OF_SECOND) - off
      assert(viaParser == expect, s"for '$s'")
    }
  }

  test("fail-fast on malformed rows (FailedToConstructMessages… semantics)") {
    intercept[MessageParser.MalformedChangeEventError](MessageParser.parse("too,few,fields"))
    intercept[MessageParser.MalformedChangeEventError](
      MessageParser.parse("2019-12-02 19:02:29.985 XYZ,c,g,i,f,t,ref,NONE,,"))
    intercept[MessageParser.MalformedChangeEventError](
      MessageParser.parse("2019-12-02 19:02:29.985 UTC,c,g,i,f,t,ref,notanint,,"))
  }

  test("generator is deterministic and parallelism-independent") {
    val cfg = GenConfig(numConversations = 50, hotConversations = 1, hotFragments = 32)
    val a = (0L until 50L).flatMap(ChangeLogGen.eventsOf(cfg, _))
    val b = (0L until 50L).flatMap(ChangeLogGen.eventsOf(cfg, _))
    assert(a == b)
    // offsets unique, op always insert, content parses
    assert(a.map(_.offset).distinct.size == a.size)
    assert(a.forall(_.op == "insert"))
    a.foreach(e => MessageParser.parse(e.content))
    // redelivered events exist and share commit + content with the original
    val dup = a.groupBy(_.commit).filter(_._2.size > 1)
    assert(dup.nonEmpty)
    dup.values.foreach(g => assert(g.map(_.content).distinct.size == 1))
    // lang encodes the interaction kind
    a.foreach { e =>
      assert(e.lang == ChangeLogGen.langOf(MessageParser.parse(e.content).interactionId))
    }
  }
}
