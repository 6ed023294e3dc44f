"""SSE ingest shim — the one non-Spark component (SURVEY.md §4.2 note).

Spark has no Server-Sent-Events source, and writing a custom streaming
Source for a tens-of-events/sec feed is not worth it (SURVEY.md §2.1 S1).
The reference's ingest personality is therefore reproduced as a small
pure-Python shim: parse the SSE wire protocol (the W3C EventSource
format, as implemented at /root/reference/pkg/ingester/sse/sse.go:58-84)
and hand events to a publisher (Kafka producer or the file queue), from
where Spark Structured Streaming takes over.

Protocol semantics preserved:
  * ``id:`` / ``event:`` / ``data:`` field lines; one optional leading
    space after the colon is stripped;
  * multi-line ``data`` joined with a single newline;
  * lines starting with ``:`` are comments — skipped;
  * a blank line terminates/flushes the pending event;
  * resume: the last seen event ID is replayed to the server as the
    ``Last-Event-ID`` request header (sse.go:101-104) — the caller owns
    reconnect/backoff (the reference restarts forever with 30 s backoff,
    coordinator.go:140-146).

The network loop itself is dependency-gated (urllib only) and untested in
this offline image; the parser is fully unit-tested.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Iterator
from dataclasses import dataclass, field


@dataclass
class SSEEvent:
    id: str = ""
    type: str = ""
    data: list[str] = field(default_factory=list)

    @property
    def body(self) -> str:
        return "\n".join(self.data)

    def is_empty(self) -> bool:
        return not (self.id or self.type or self.data)


def _field(line: str, name: str) -> str | None:
    """Return the value if ``line`` carries field ``name``, else None."""
    if not line.startswith(name + ":"):
        return None
    value = line[len(name) + 1 :]
    return value[1:] if value.startswith(" ") else value


def parse_sse_lines(lines: Iterable[str]) -> Iterator[SSEEvent]:
    """Incremental SSE protocol parser: text lines in, events out."""
    current = SSEEvent()
    for raw in lines:
        line = raw.rstrip("\r\n")
        if line == "":
            if not current.is_empty():
                yield current
            current = SSEEvent()
            continue
        if line.startswith(":"):
            continue
        for name in ("id", "event", "data"):
            value = _field(line, name)
            if value is None:
                continue
            if name == "id":
                current.id = value
            elif name == "event":
                current.type = value
            else:
                current.data.append(value)
            break
    if not current.is_empty():
        yield current


def subscribe(
    url: str,
    on_event: Callable[[SSEEvent], None],
    resume_id: str = "",
    timeout: float = 60.0,
) -> str:
    """Blocking subscribe loop (one connection attempt; caller handles
    reconnect/backoff like the reference's coordinator). Returns the last
    event ID seen, for resume."""
    import urllib.request

    req = urllib.request.Request(url, headers={"Accept": "text/event-stream"})
    if resume_id:
        req.add_header("Last-Event-ID", resume_id)
    last_id = resume_id
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        for event in parse_sse_lines(
            raw.decode("utf-8", errors="replace") for raw in resp
        ):
            if event.id:
                last_id = event.id
            on_event(event)
    return last_id
