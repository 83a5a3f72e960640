#!/usr/bin/env python3
"""Single-node throughput of the REFERENCE pipeline (the published baseline
has no wall times, so measure it here): synthesize spine-message dicts in
the reference's splunk-item shape, then time its own
parse -> group -> Gp2gpConversation -> convert_to_transfers chain
(`src/prmdata/domain/gp2gp/transfer_service.py`). Single-threaded CPython,
as the reference runs in production. Run:
  python3 BENCH/reference_bench.py [n_conversations]
"""
import sys, time
sys.path.insert(0, "/root/reference/src")
from datetime import timedelta
from prmdata.domain.spine.message import (
    construct_messages_from_splunk_items,
    EHR_REQUEST_STARTED, EHR_REQUEST_COMPLETED, APPLICATION_ACK, COMMON_POINT_TO_POINT,
)
from prmdata.domain.gp2gp.transfer_service import (
    TransferService, TransferServiceObservabilityProbe,
)
from prmdata.domain.ods_portal.organisation_lookup import OrganisationLookup

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000

def items():
    # 4-message integrated conversation + every 16th gets 4 COPC fragments:
    # the same shape ChangeLogGen emits for the Spark-side benchmarks
    for c in range(N):
        conv = f"conv-{c:010d}"
        day = 2 + (c % 25)
        base = f"2019-12-{day:02d}"
        yield {"_time": f"{base} 08:00:00.000", "conversationID": conv,
               "GUID": f"{conv}-m0", "interactionID": EHR_REQUEST_STARTED,
               "messageSender": f"asid-{c % 997}", "messageRecipient": f"asid-{(c+1) % 997}",
               "messageRef": "NotProvided", "jdiEvent": "NONE",
               "fromSystem": "SysA", "toSystem": "SysB"}
        yield {"_time": f"{base} 08:05:00.000", "conversationID": conv,
               "GUID": f"{conv}-m1", "interactionID": EHR_REQUEST_COMPLETED,
               "messageSender": f"asid-{(c+1) % 997}", "messageRecipient": f"asid-{c % 997}",
               "messageRef": "NotProvided", "jdiEvent": "NONE",
               "fromSystem": "SysA", "toSystem": "SysB"}
        if c % 16 == 0:
            for f in range(4):
                yield {"_time": f"{base} 08:1{f}:00.000", "conversationID": conv,
                       "GUID": f"{conv}-c{f}", "interactionID": COMMON_POINT_TO_POINT,
                       "messageSender": f"asid-{(c+1) % 997}", "messageRecipient": f"asid-{c % 997}",
                       "messageRef": "NotProvided", "jdiEvent": "NONE",
                       "fromSystem": "SysA", "toSystem": "SysB"}
        yield {"_time": f"{base} 09:00:00.000", "conversationID": conv,
               "GUID": f"{conv}-m2", "interactionID": APPLICATION_ACK,
               "messageSender": f"asid-{c % 997}", "messageRecipient": f"asid-{(c+1) % 997}",
               "messageRef": f"{conv}-m1", "jdiEvent": "NONE" if c % 7 else "30",
               "fromSystem": "SysA", "toSystem": "SysB"}

rows = list(items())
n_events = len(rows)
lookup = OrganisationLookup(practices=[], sicbls=[], year_month=(2019, 12))
svc = TransferService(cutoff=timedelta(days=14),
                      observability_probe=TransferServiceObservabilityProbe())

t0 = time.perf_counter()
messages = construct_messages_from_splunk_items(rows)
conversations = svc.group_into_conversations(messages)
gp2gp = svc.parse_conversations_into_gp2gp_conversations(conversations)
transfers = list(svc.convert_to_transfers(gp2gp, organisation_lookup=lookup))
sec = time.perf_counter() - t0

import json
print(json.dumps({"metric": "reference_classify", "events": n_events,
                  "transfers": len(transfers), "sec": round(sec, 2),
                  "events_per_sec": int(n_events / sec)}))
