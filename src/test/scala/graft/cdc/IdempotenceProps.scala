package graft.cdc

import graft.classifier.TransferClassifier
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck property tests — the SURVEY.md §5 redelivery-idempotence
  * properties: for ANY shuffling and duplication of a conversation's event
  * stream, the per-key fold produces the same classified row.
  */
object IdempotenceProps extends Properties("CdcFold") {

  private val day = 24L * 3600 * 1000000L
  private val cfg = GenConfig(numConversations = 400, hotConversations = 0, hotFragments = 1)

  private val convGen: Gen[Long] = Gen.choose(0L, 399L)

  private def eventsOf(conv: Long): Seq[ChangeEvent] = ChangeLogGen.eventsOf(cfg, conv)

  property("fold is order-insensitive") = forAll(convGen, Gen.long) { (conv, seed) =>
    val events = eventsOf(conv)
    val shuffled = new scala.util.Random(seed).shuffle(events)
    CdcPipeline.classifyGroup(f"repo-$conv%010d", events.iterator.map(_.slim), 14 * day) ==
      CdcPipeline.classifyGroup(f"repo-$conv%010d", shuffled.iterator.map(_.slim), 14 * day)
  }

  property("fold is redelivery-idempotent (any duplication at later offsets)") =
    forAll(convGen, Gen.long) { (conv, seed) =>
      val events = eventsOf(conv)
      val rng = new scala.util.Random(seed)
      val dupes = events.filter(_ => rng.nextBoolean())
        .map(e => e.copy(offset = e.offset + 100000L + rng.nextInt(1000)))
      val noisy = rng.shuffle(events ++ dupes ++ dupes)
      val clean = CdcPipeline.classifyGroup(f"repo-$conv%010d", events.iterator.map(_.slim), 14 * day)
      val redelivered = CdcPipeline.classifyGroup(f"repo-$conv%010d", noisy.iterator.map(_.slim), 14 * day)
      clean.map(_.copy(duplicatesDropped = 0)) ==
        redelivered.map(_.copy(duplicatesDropped = 0))
    }

  property("classifier outcome is stable under equal-time reordering") =
    forAll(convGen) { conv =>
      val msgs = ChangeLogGen.conversationMessages(cfg, conv)
      // stable sort must preserve semantics when already ordered
      val sorted = TransferClassifier.stableSortByTime(msgs)
      TransferClassifier.classify(msgs, 14 * day) ==
        TransferClassifier.classify(sorted, 14 * day)
    }

  property("timestamp fast path round-trips arbitrary micros") =
    forAll(Gen.choose(0L, 4102444800000000L)) { micros => // 1970..2100
      MessageParser.parseTimeMicros(MessageParser.formatTime(micros)) == micros &&
        MessageParser.parseTimeMicros(MessageParser.formatTime(micros, "BST")) == micros
    }
}
