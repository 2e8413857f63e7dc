"""Concurrency over real HTTP: the threaded server + store locks hold up.

The reference runs rouille (threaded) against jfs stores; our
ThreadingHTTPServer handles requests in parallel threads, so participations
landing concurrently and clerks polling/pushing concurrently must not lose
or double-count anything. The reveal at the end is the full correctness
oracle: every concurrent participation is included exactly once.
"""

import threading

import numpy as np

from sda_tpu import protocol as proto

from .fixtures import make_client, with_service


def test_concurrent_participations_and_clerking_over_http():
    with with_service("http") as service:
        recipient = make_client(service)
        rk = recipient.new_encryption_key()
        recipient.upload_agent()
        recipient.upload_encryption_key(rk)
        dim, n_participants = 6, 12
        agg = proto.Aggregation(
            id=proto.new_id(),
            title="concurrent",
            vector_dimension=dim,
            modulus=433,
            recipient=recipient.agent.id,
            recipient_key=rk,
            masking_scheme=proto.NoMasking(),
            committee_sharing_scheme=proto.AdditiveSharing(share_count=3, modulus=433),
        )
        recipient.upload_aggregation(agg)
        clerks = [make_client(service) for _ in range(3)]
        for c in clerks:
            key = c.new_encryption_key()
            c.upload_agent()
            c.upload_encryption_key(key)
        recipient.begin_aggregation(agg.id)

        # 12 participants upload in parallel threads (each its own client +
        # HTTP connection, like real phones)
        errors = []

        def participate(i):
            try:
                p = make_client(service)
                p.upload_agent()
                p.participate(np.arange(dim) + i, agg.id)
            except Exception as e:  # noqa: BLE001 - collected for the assert
                errors.append(e)

        threads = [
            threading.Thread(target=participate, args=(i,))
            for i in range(n_participants)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors, errors

        recipient.end_aggregation(agg.id)

        # all committee members clerk concurrently
        def chores(client):
            try:
                client.run_chores(-1)
            except Exception as e:  # noqa: BLE001
                errors.append(e)

        workers = [
            threading.Thread(target=chores, args=(c,))
            for c in clerks + [recipient]
        ]
        for t in workers:
            t.start()
        for t in workers:
            t.join()
        assert not errors, errors

        out = recipient.reveal_aggregation(agg.id)
        want = [
            int(sum(j + i for i in range(n_participants))) % 433
            for j in range(dim)
        ]
        assert out.positive().values.tolist() == want
