"""SQS-backed work queue honoring the same claim contract as the
sqlite ``Queue`` (reference ``pkg/storage/queue/sqs/sqs.go``).

Mapping of the contract onto SQS primitives:

* ``enqueue``  → ``send_message`` with a JSON body ``{type, payload}``.
* ``dequeue``  → ``receive_message`` with ``VisibilityTimeout`` =
  ``requeue_after``; the receipt handle becomes ``Message.id`` (claim
  token). An unacknowledged message reappears after the timeout —
  the same at-least-once replay the sqlite queue implements with the
  ``claimed_at`` column.
* ``complete`` → ``delete_message``.
* ``fail``     → ``change_message_visibility(0)`` for immediate
  retry; terminal poison handling is SQS's native redrive policy
  (``maxReceiveCount`` → dead-letter queue), configured on the queue
  itself rather than in this client.

boto3 is not installed in this container, so the client is injected
(tests use a fake); constructing without one raises with guidance.
At scale this is the right queue: hundreds of ingest nodes enqueue
without contending on one sqlite file, and worker fleets scale
horizontally on visibility-timeout claims.
"""

from __future__ import annotations

import json

from scratchdata_spark.queue import Message


class SQSQueue:
    def __init__(self, queue_url: str, requeue_after: float = 300.0, client=None):
        if client is None:
            try:
                import boto3  # deferred: not installed in this environment
            except ImportError as e:  # pragma: no cover
                raise RuntimeError(
                    "SQSQueue needs boto3 (pip install boto3) or an "
                    "injected client"
                ) from e
            client = boto3.client("sqs")  # pragma: no cover
        self.client = client
        self.queue_url = queue_url
        self.requeue_after = int(requeue_after)

    def enqueue(self, type_: str, payload: dict) -> str:
        resp = self.client.send_message(
            QueueUrl=self.queue_url,
            MessageBody=json.dumps({"type": type_, "payload": payload}),
        )
        return resp["MessageId"]

    def dequeue(self) -> Message | None:
        resp = self.client.receive_message(
            QueueUrl=self.queue_url,
            MaxNumberOfMessages=1,
            VisibilityTimeout=self.requeue_after,
            WaitTimeSeconds=0,
        )
        msgs = resp.get("Messages") or []
        if not msgs:
            return None
        m = msgs[0]
        body = json.loads(m["Body"])
        return Message(
            id=m["ReceiptHandle"], type=body["type"], payload=body["payload"]
        )

    def complete(self, msg_id: str) -> None:
        self.client.delete_message(QueueUrl=self.queue_url, ReceiptHandle=msg_id)

    def fail(self, msg_id: str, error: str = "") -> None:
        # release immediately for retry; redrive policy dead-letters
        # after maxReceiveCount (queue-side, not client-side)
        self.client.change_message_visibility(
            QueueUrl=self.queue_url, ReceiptHandle=msg_id, VisibilityTimeout=0
        )

    def pending(self) -> int:
        resp = self.client.get_queue_attributes(
            QueueUrl=self.queue_url,
            AttributeNames=["ApproximateNumberOfMessages"],
        )
        return int(resp["Attributes"]["ApproximateNumberOfMessages"])
