"""Paged-cursor API source as a Spark 4 Python Data Source (SURVEY.md
S5/S6).

The reference's feeders own a cursor-pagination loop outside any
engine: ``while cursor != "end"`` over Twitch Helix ``GET /streams``
with ``{"first": 100, "after": cursor}`` pages
(``scripts/get_raw_data/get_raw_streams_data.py:78-101``), fanned out
over 100-id batches for IGDB lookups
(``scripts/get_raw_data/get_raw_genre_bridge_data.py:82-91``). Earlier
rounds replayed the recorded raw JSON through the file source (S1) and
declared the feeders out of engine scope; this module closes that gap
by making the engine own the ingest contract itself via
:class:`pyspark.sql.datasource.DataSource`:

``spark.dataSource.register(PagedEnvelopeDataSource)`` then::

    spark.read.format("paged_envelope").option("path", recorded_dir).load()
    spark.readStream.format("paged_envelope")
         .option("path", recorded_dir)
         .option("max_pages_per_trigger", "2").load()

Output schema: ``batch_id string, page int, record_pos int, value
string`` — one row per element of each envelope's ``data`` array, with
the element re-serialized as a JSON string. Downstream parsing is the
existing S1 path (``from_json`` with the envelope record schema), so
the source stays schema-agnostic like the reference's raw layer.

Scale shape — the cursor chain is inherently sequential (each page
names the next), so the parallel axis is the BATCH, exactly as in the
reference (category id-sets / 100-id IGDB chunks): ``partitions()``
plans one :class:`InputPartition` per batch and each executor task
walks its own chain. A 1000-executor cluster ingests 1000 id-batches
concurrently; no axis of a paged API parallelizes further without
server-side offsets. The streaming reader is a
:class:`SimpleDataSourceStreamReader` — driver-side by design, the
right regime for a rate-limited API poller (pages/trigger is the
``maxFilesPerTrigger`` analog) — and its offsets are the cursor map
itself, so a checkpoint restart resumes mid-chain without re-fetching
committed pages, strictly stronger than the reference's
at-most-once-by-choice SQS consumption.

Transports:

- ``transport=file`` (default): replays a recorded API session from
  ``{path}/{batch_id}/{cursor}.json`` where the opening cursor is
  ``start`` and each envelope's ``pagination.cursor`` names the next
  file; an empty/absent ``pagination`` ends the chain — byte-for-byte
  the Helix loop contract, deterministic, and what every test uses.
- ``transport=http``: the same protocol against a live endpoint
  (``url`` + ``batch_param`` + ``page_size`` options, cursor sent as
  ``after``) via :func:`urllib.request.urlopen`. Unit-tested with a
  monkeypatched opener; exactly-once replay (``readBetweenOffsets``)
  is only guaranteed by the file transport, because a live API cannot
  replay a committed range — record pages to files first if the
  downstream needs deterministic reprocessing.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Iterator, Sequence, Tuple

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

#: sentinel opening cursor — the reference starts with ``cursor = ""``;
#: a named sentinel keeps it distinct from a server-issued cursor and
#: filesystem-safe for the file transport.
START_CURSOR = "start"

#: sentinel terminal cursor, mirroring the reference's ``"end"``.
END_CURSOR = "end"


def _make_pager(options: dict):
    transport = (options.get("transport") or "file").lower()
    if transport == "file":
        path = options.get("path")
        if not path:
            raise ValueError("paged_envelope: option 'path' is required "
                             "for transport=file")
        return FilePager(path)
    if transport == "http":
        url = options.get("url")
        if not url:
            raise ValueError("paged_envelope: option 'url' is required "
                             "for transport=http")
        return HttpPager(
            url,
            batch_param=options.get("batch_param", "game_id"),
            page_size=int(options.get("page_size", "100")),
            headers=json.loads(options.get("headers", "{}")),
        )
    raise ValueError(f"paged_envelope: unknown transport {transport!r}")


def _batches(options: dict, pager) -> list[str]:
    explicit = options.get("batches")
    if explicit:
        return [b for b in explicit.split(",") if b]
    found = pager.list_batches()
    if not found:
        raise ValueError(
            "paged_envelope: no batches — pass option 'batches' or point "
            "'path' at a directory with one sub-directory per batch"
        )
    return found


class FilePager:
    """Recorded-session transport: one file per page, cursor-linked."""

    def __init__(self, root: str):
        self.root = root

    def list_batches(self) -> list[str]:
        if not os.path.isdir(self.root):
            return []
        return sorted(
            d for d in os.listdir(self.root)
            if os.path.isdir(os.path.join(self.root, d))
        )

    def fetch(self, batch_id: str, cursor: str) -> dict:
        fname = os.path.join(self.root, batch_id, f"{cursor}.json")
        with open(fname, encoding="utf-8") as fh:
            return json.load(fh)


class HttpPager:
    """Live-endpoint transport: the Helix loop with cursor as ``after``.

    ``_urlopen`` is an instance attribute precisely so tests (and
    recording tools) can inject a fake opener without monkeypatching
    module globals.
    """

    def __init__(self, url: str, *, batch_param: str, page_size: int,
                 headers: dict):
        self.url = url
        self.batch_param = batch_param
        self.page_size = page_size
        self.headers = headers
        from urllib.request import urlopen

        self._urlopen = urlopen

    def list_batches(self) -> list[str]:
        return []  # batches must be explicit for a live endpoint

    def fetch(self, batch_id: str, cursor: str) -> dict:
        from urllib.parse import urlencode
        from urllib.request import Request

        params = {self.batch_param: batch_id, "first": self.page_size}
        if cursor != START_CURSOR:
            params["after"] = cursor
        req = Request(
            f"{self.url}?{urlencode(params)}", headers=self.headers
        )
        with self._urlopen(req) as resp:
            return json.load(resp)


def _walk(pager, batch_id: str, cursor: str, page_limit: int):
    """Follow the cursor chain from ``cursor``, yielding
    ``(page_envelope, this_cursor, next_cursor)``. Raises on cursor
    cycles and on chains longer than ``page_limit`` — a mis-recorded
    session or a misbehaving server must fail loudly, not loop an
    executor forever (the reference's bare while-loop would)."""
    seen: set[str] = set()
    pages = 0
    while cursor != END_CURSOR:
        if cursor in seen:
            raise RuntimeError(
                f"paged_envelope: cursor cycle at {cursor!r} in batch "
                f"{batch_id!r}"
            )
        seen.add(cursor)
        if pages >= page_limit:
            raise RuntimeError(
                f"paged_envelope: batch {batch_id!r} exceeded page_limit="
                f"{page_limit}; raise the option if the chain is real"
            )
        envelope = pager.fetch(batch_id, cursor)
        pagination = envelope.get("pagination") or {}
        nxt = pagination.get("cursor") or END_CURSOR
        yield envelope, cursor, nxt
        cursor = nxt
        pages += 1


def _rows(envelope: dict, batch_id: str, page: int):
    for pos, record in enumerate(envelope.get("data") or []):
        yield (batch_id, page, pos,
               json.dumps(record, sort_keys=True, separators=(",", ":")))


@dataclass
class BatchPartition(InputPartition):
    batch_id: str


class PagedEnvelopeReader(DataSourceReader):
    def __init__(self, options: dict):
        self.options = dict(options)
        self.page_limit = int(options.get("page_limit", "10000"))

    def partitions(self) -> Sequence[InputPartition]:
        pager = _make_pager(self.options)
        return [BatchPartition(b) for b in _batches(self.options, pager)]

    def read(self, partition: BatchPartition) -> Iterator[Tuple]:
        pager = _make_pager(self.options)
        page = 0
        for envelope, _cur, _nxt in _walk(
            pager, partition.batch_id, START_CURSOR, self.page_limit
        ):
            yield from _rows(envelope, partition.batch_id, page)
            page += 1


class PagedEnvelopeStreamReader(SimpleDataSourceStreamReader):
    """Offsets ARE the chain position: ``{"cursors": {batch: cursor},
    "pages": {batch: pages_done}}``.

    ``pages_done`` makes the ``page`` output column CHAIN-GLOBAL — the
    same record carries the same (batch_id, page, record_pos) key
    whether it arrived through one batch read or many rate-limited
    micro-batches (streaming/batch parity for downstreams that derive
    positions from it). Each micro-batch advances every batch's chain
    by at most ``max_pages_per_trigger`` pages (rate limiting, the
    ``maxFilesPerTrigger`` analog). A cursor whose page is not yet
    recorded (a live recorder mid-write: ``pagination.cursor`` written
    before the next file exists) PARKS — the batch emits nothing this
    trigger and retries the same cursor on the next one — instead of
    killing the query. ``end`` is terminal, mirroring the reference's
    ``cursor = "end"`` loop exit: a finished chain is never re-read.

    Guard rails, honestly stated:

    - ``page_limit`` bounds the TOTAL chain length per batch (default
      10000) — the runaway/cycle backstop. A long-lived live chain
      must raise it; the ceiling exists because a cursor cycle longer
      than one trigger window cannot be detected statelessly (the
      offset holds one cursor, not the visited set), so bounding chain
      length is what turns an undetected cycle from an infinite
      duplicate stream into a loud error. Self-loops (a page naming
      itself as next) and cycles shorter than one trigger's walk are
      detected immediately.
    - ``max_consecutive_stalls`` (default 0 = unlimited) raises after
      N successive triggers in which a parked batch made no progress —
      the opt-in alarm that distinguishes a recorder that is merely
      behind from a page file that will never exist (deleted /
      recorder dead). Unlimited by default because a legitimate
      recorder can lag arbitrarily; set it when liveness matters more
      than patience. Stall counts ride in the offset
      (``{"stalls": {batch: n}}``) so they survive query restarts."""

    def __init__(self, options: dict):
        self.options = dict(options)
        self.page_limit = int(options.get("page_limit", "10000"))
        self.max_pages = int(options.get("max_pages_per_trigger", "1"))
        self.max_stalls = int(options.get("max_consecutive_stalls", "0"))
        self._pager = _make_pager(self.options)

    def initialOffset(self) -> dict:
        batches = _batches(self.options, self._pager)
        return {
            "cursors": {b: START_CURSOR for b in batches},
            "pages": {b: 0 for b in batches},
            "stalls": {b: 0 for b in batches},
        }

    def _advance(self, batch_id: str, cursor: str, page_no: int,
                 max_pages: int, collect):
        """Walk ``batch_id``'s chain from ``cursor`` for at most
        ``max_pages`` pages, passing (envelope, page_no) to
        ``collect``; returns the (cursor, page_no) to commit. Parks on
        a not-yet-recorded page file. Cycle detection is best-effort by
        construction: self-loops and cycles shorter than this trigger's
        walk raise here; longer cycles are only caught by the
        ``page_limit`` chain-length ceiling (see class docstring)."""
        seen: set[str] = set()
        taken = 0
        while cursor != END_CURSOR and taken < max_pages:
            if cursor in seen:
                raise RuntimeError(
                    f"paged_envelope: cursor cycle at {cursor!r} in batch "
                    f"{batch_id!r}"
                )
            seen.add(cursor)
            if page_no >= self.page_limit:
                raise RuntimeError(
                    f"paged_envelope: batch {batch_id!r} exceeded "
                    f"page_limit={self.page_limit} total pages (the "
                    "runaway/cycle backstop); raise the option if the "
                    "chain is genuinely this long"
                )
            try:
                envelope = self._pager.fetch(batch_id, cursor)
            except FileNotFoundError:
                break  # page not recorded yet: park, retry next trigger
            pagination = envelope.get("pagination") or {}
            nxt = pagination.get("cursor") or END_CURSOR
            if nxt == cursor:
                raise RuntimeError(
                    f"paged_envelope: page {cursor!r} in batch {batch_id!r} "
                    "names itself as its own next page (self-loop)"
                )
            collect(envelope, page_no)
            cursor = nxt
            page_no += 1
            taken += 1
        return cursor, page_no

    def read(self, start: dict) -> Tuple[Iterator[Tuple], dict]:
        out: list[Tuple] = []
        start_pages = start.get("pages", {})
        start_stalls = start.get("stalls", {})
        end = {
            "cursors": dict(start["cursors"]),
            "pages": dict(start_pages),
            "stalls": dict(start_stalls),
        }
        for batch_id, cursor in start["cursors"].items():
            if cursor == END_CURSOR:
                continue
            page_was = int(start_pages.get(batch_id, 0))
            cursor, page_no = self._advance(
                batch_id,
                cursor,
                page_was,
                self.max_pages,
                lambda env, pno, b=batch_id: out.extend(_rows(env, b, pno)),
            )
            end["cursors"][batch_id] = cursor
            end["pages"][batch_id] = page_no
            stalls = (
                0 if page_no > page_was
                else int(start_stalls.get(batch_id, 0)) + 1
            )
            end["stalls"][batch_id] = stalls
            if self.max_stalls and stalls >= self.max_stalls:
                raise RuntimeError(
                    f"paged_envelope: batch {batch_id!r} parked at "
                    f"{cursor!r} for {stalls} consecutive triggers "
                    f"(max_consecutive_stalls={self.max_stalls}) — the "
                    "next page file never appeared; recorder dead or "
                    "session truncated?"
                )
        return iter(out), end

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[Tuple]:
        # deterministic replay of a committed range — file transport
        # only (a live API cannot replay); used by Spark on recovery.
        # Committed ranges were fully recorded when first read, so a
        # missing page here is corruption and raises loudly.
        start_pages = start.get("pages", {})
        for batch_id, cursor in start["cursors"].items():
            stop = end["cursors"].get(batch_id, END_CURSOR)
            if cursor == stop:
                continue
            page_no = int(start_pages.get(batch_id, 0))
            for envelope, _cur, nxt in _walk(
                self._pager, batch_id, cursor, self.page_limit
            ):
                yield from _rows(envelope, batch_id, page_no)
                page_no += 1
                if nxt == stop:
                    break


class PagedEnvelopeDataSource(DataSource):
    """``format("paged_envelope")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "paged_envelope"

    def schema(self) -> str:
        return "batch_id string, page int, record_pos int, value string"

    def reader(self, schema) -> PagedEnvelopeReader:
        return PagedEnvelopeReader(self.options)

    def simpleStreamReader(self, schema) -> PagedEnvelopeStreamReader:
        return PagedEnvelopeStreamReader(self.options)
