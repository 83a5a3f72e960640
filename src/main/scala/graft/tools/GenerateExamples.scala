package graft.tools

import graft.classifier.{Scenarios, SpineMessage}
import graft.vis.ConversationVisualiser

/** Port of the reference's docs generator (`scripts/generate_examples.py`):
  * renders every scenario of the ported corpus as a markdown section with
  * its ASCII sequence diagram (minimal output, builder order — exactly the
  * reference's `format_csv_rows(..., sort_messages=False,
  * minimal_output=True)`). The reference gathers cases by reflection over
  * `tests/builders/test_cases.py`; here the corpus is the explicit list
  * below (same scenarios, same order of appearance).
  */
object GenerateExamples {

  private val examples: Seq[(String, String, Vector[SpineMessage])] = Seq(
    ("request made", "A GP2GP transfer that never got past the initial request.",
      Scenarios.requestMade),
    ("request acknowledged successfully",
      "The request was acknowledged by the sender, then nothing further happened.",
      Scenarios.requestAcknowledgedSuccessfully),
    ("request acknowledged with error",
      "The sender acknowledged the request with an error code.",
      Scenarios.requestAcknowledgedWithError()),
    ("core ehr sent", "The core EHR was sent but never integrated.",
      Scenarios.coreEhrSent),
    ("core ehr sent with sender error",
      "The sender reported an error, but still sent the core EHR.",
      Scenarios.coreEhrSentWithSenderError()),
    ("acknowledged duplicate and waiting for integration",
      "A duplicate core EHR was negatively acknowledged; the original awaits integration.",
      Scenarios.acknowledgedDuplicateAndWaitingForIntegration),
    ("only acknowledged duplicates",
      "Every core EHR copy was acknowledged as a duplicate.",
      Scenarios.onlyAcknowledgedDuplicates),
    ("unacknowledged duplicate with copcs and waiting for integration",
      "Duplicate EHRs and COPC fragments with an unacknowledged copy outstanding.",
      Scenarios.unacknowledgedDuplicateWithCopcsAndWaitingForIntegration),
    ("ehr integrated successfully", "A transfer integrated within the SLA.",
      Scenarios.ehrIntegratedSuccessfully()),
    ("ehr integrated late", "A transfer integrated after the 8-day SLA.",
      Scenarios.ehrIntegratedLate),
    ("ehr suppressed", "The record was integrated by being suppressed.",
      Scenarios.ehrSuppressed),
    ("ehr integration failed", "The requester failed to integrate the record.",
      Scenarios.ehrIntegrationFailed()),
    ("ehr missing message for an acknowledgement",
      "The sender acknowledged a non-existent message.",
      Scenarios.ehrMissingMessageForAnAcknowledgement),
    ("ehr integrated after duplicate",
      "The duplicate copy was rejected, then the original was integrated.",
      Scenarios.ehrIntegratedAfterDuplicate),
    ("integration failed after duplicate",
      "The duplicate copy was rejected, then integration of the original failed.",
      Scenarios.integrationFailedAfterDuplicate()),
    ("first ehr integrated after second ehr failed",
      "Two EHR copies: the second failed, then the first was integrated.",
      Scenarios.firstEhrIntegratedAfterSecondEhrFailed()),
    ("first ehr integrated before second ehr failed",
      "Two EHR copies: the first was integrated, then the second failed.",
      Scenarios.firstEhrIntegratedBeforeSecondEhrFailed()),
    ("second ehr integrated after first ehr failed",
      "Two EHR copies: the first failed, then the second was integrated.",
      Scenarios.secondEhrIntegratedAfterFirstEhrFailed()),
    ("second ehr integrated before first ehr failed",
      "Two EHR copies: the second was integrated, then the first failed.",
      Scenarios.secondEhrIntegratedBeforeFirstEhrFailed()),
    ("ehr integrated with duplicate having second sender ack after integration",
      "A third EHR copy arrived after integration and was ignored.",
      Scenarios.ehrIntegratedWithDuplicateHavingSecondSenderAckAfterIntegration),
    ("multiple integration failures",
      "Several core EHRs, each acknowledged with an error.",
      Scenarios.multipleIntegrationFailures()),
    ("copc continue sent",
      "The requester asked for fragments; none arrived.",
      Scenarios.copcContinueSent),
    ("copc fragment failure",
      "A COPC fragment was negatively acknowledged.",
      Scenarios.copcFragmentFailure()),
    ("copc fragment failure and missing copc fragment ack",
      "One fragment failed and another was never acknowledged.",
      Scenarios.copcFragmentFailureAndMissingCopcFragmentAck()),
    ("successful integration with copc fragments",
      "A large-message transfer fully acknowledged and integrated.",
      Scenarios.successfulIntegrationWithCopcFragments),
    ("pending integration with copc fragments",
      "Fragments arrived but were never acknowledged.",
      Scenarios.pendingIntegrationWithCopcFragments),
    ("pending integration with acked copc fragments",
      "All fragments acknowledged; integration still pending.",
      Scenarios.pendingIntegrationWithAckedCopcFragments),
    ("copc fragment failures", "Several fragments each failed.",
      Scenarios.copcFragmentFailures()),
    ("ehr integrated with conflicting acks and duplicate ehrs",
      "Conflicting acknowledgements over duplicate EHRs; integrated.",
      Scenarios.ehrIntegratedWithConflictingAcksAndDuplicateEhrs),
    ("ehr suppressed with conflicting acks and duplicate ehrs",
      "Conflicting acknowledgements over duplicate EHRs; suppressed.",
      Scenarios.ehrSuppressedWithConflictingAcksAndDuplicateEhrs),
    ("integration failed with conflicting acks and duplicate ehrs",
      "Conflicting acknowledgements over duplicate EHRs; failed.",
      Scenarios.integrationFailedWithConflictingAcksAndDuplicateEhrs()),
    ("ehr integrated with conflicting duplicate and conflicting error ack",
      "One EHR with error, duplicate and positive acks; integrated wins.",
      Scenarios.ehrIntegratedWithConflictingDuplicateAndConflictingErrorAck),
    ("ehr suppressed with conflicting duplicate and conflicting error ack",
      "One EHR with error, duplicate and suppressed acks; suppressed wins.",
      Scenarios.ehrSuppressedWithConflictingDuplicateAndConflictingErrorAck),
    ("multiple sender acknowledgements",
      "The request was acknowledged more than once.",
      Scenarios.multipleSenderAcknowledgements(Seq(None, None))),
  )

  private def title(name: String): String =
    name.split(' ').map(w => w.take(1).toUpperCase + w.drop(1)).mkString(" ")

  def render(): String = {
    val sb = new StringBuilder
    sb ++= "# Example GP2GP Test Cases\n"
    sb ++= "This document describes the scenarios used to test the transfer classifier.\n"
    sb ++= "These examples are auto-generated from source.\n"
    sb ++= "Note: Many are quite rare edge cases.\n"
    examples.foreach { case (name, desc, msgs) =>
      sb ++= s"\n\n## ${title(name)}\n\n"
      sb ++= desc + "\n"
      sb ++= "\n```\n"
      sb ++= ConversationVisualiser.format(msgs, minimal = true, sortMessages = false)
      sb ++= "\n```\n"
    }
    sb.result()
  }

  def main(args: Array[String]): Unit = print(render())
}
