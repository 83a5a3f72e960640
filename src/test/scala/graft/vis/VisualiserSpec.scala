package graft.vis

import graft.classifier.Scenarios
import org.scalatest.funsuite.AnyFunSuite

/** Byte-parity goldens for the visualiser port: the expected strings below
  * were produced by the REFERENCE's own `gp2gpvis/visualiser.py`
  * (`format_csv_rows`) over the same deterministic message sequences the
  * scenario builders emit.
  */
class VisualiserSpec extends AnyFunSuite {

  test("full output matches the reference formatter byte-for-byte") {
    val got = ConversationVisualiser.format(Scenarios.ehrIntegrationFailed(28))
    val want =
      """GP2GP Conversation: conv-1
        |Requester: 123456789012 (SystemOne)
        |Sender: 987654321098 (Vision)
        |
        |     Requester                                                        Sender
        |         |                                                              |
        |         | ------------------ (conv-) GP2GP request ------------------> |   20-01-01 00:01:00
        |         |                                                              |
        |         | <---- (conv-) Acknowledgement of GP2GP request 'conv-' ----- |   20-01-01 00:02:00
        |         |                                                              |
        |         | <--------------------- (ehr) Core EHR ---------------------- |   20-01-01 00:03:00
        |         |                                                              |
        |         | -------- (conv-) Acknowledgement of Core EHR 'ehr' --------> |   20-01-01 00:04:00
        |         |                Error code: 28 (Wrong patient)                |""".stripMargin
    assert(got == want)
  }

  test("minimal output + dangling-ack annotation match the reference") {
    val got = ConversationVisualiser.format(
      Scenarios.ehrMissingMessageForAnAcknowledgement,
      minimal = true, sortMessages = false)
    val want =
      """     Requester                                                        Sender
        |         |                                                              |
        |         | ------------------ (conv-) GP2GP request ------------------> |
        |         |                                                              |
        |         | <---- (conv-) Acknowledgement of non existent message! ----- |""".stripMargin
    assert(got == want)
  }

  test("same-second messages keep input order (reference sorts second-truncated)") {
    // the reference's RowMessage splits off the fractional second before
    // fromisoformat, so its sort key is second-truncated and same-second
    // messages keep CSV order. A full-micros sort would put this ack
    // (xx.1s) before its request (xx.9s) and reject the conversation.
    val msgs = Scenarios.requestAcknowledgedSuccessfully
    val base = msgs(0).timeMicros
    val req = msgs(0).copy(timeMicros = base + 900000L)
    val ack = msgs(1).copy(timeMicros = base + 100000L)
    val out = ConversationVisualiser.format(Vector(req, ack), minimal = true)
    assert(out.indexOf("GP2GP request -") < out.indexOf("Acknowledgement of"))
  }

  test("rejects a conversation not starting with a request (reference raise)") {
    intercept[IllegalArgumentException] {
      ConversationVisualiser.format(
        Scenarios.requestAcknowledgedSuccessfully.reverse, sortMessages = false)
    }
  }
}
