"""Pure-Python oracle of the reference crawler's MainLoop semantics.

This is the golden model the Spark crawl is tested against (FIXTURES.md
§7.2). It re-implements, in ~60 lines, the scheduling semantics of
``Crawler.MainLoop`` (reference crawler/crawling/crawler.go:181-240):

  * a round repeatedly fetches keyset chunks:
    ``SELECT id FROM nodes WHERE id > cursor ORDER BY id ASC LIMIT chunk``
    (crawler/db/mysql.go:101-129) — a snapshot taken *before* the chunk is
    processed;
  * the chunk is processed in parallel groups of ``group_size``
    (MaxCoroutineCnt=10, crawler/main.go:36) with a barrier per group
    (wg.Wait, crawler/crawling/crawler.go:222);
  * processing a node discovers its links (GetConnections,
    crawler/rpc/rpc.go:62-86), filters self-links (crawler.go:73-77), and
    INSERT-IGNOREs new ids with a never-crawled sentinel
    (crawler/db/mysql.go:277-320) — so a discovery sorting *after* the
    cursor is picked up later in the same round, one sorting before it
    waits for the next round;
  * the round ends when a chunk comes back empty
    (crawler/crawling/crawler.go:226-228).

Visit order within a group is goroutine-nondeterministic in the reference;
the deterministic comparable is ascending-id order within each chunk, which
is what both this oracle and the Spark strict mode produce.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable


def reference_crawl(
    seeds: Iterable[str],
    links_of: Callable[[str], list[str]],
    rounds: int = 1,
    chunk_size: int = 100,
    group_size: int = 10,
    canonicalize: Callable[[str], str | None] = lambda u: u,
) -> tuple[list[tuple[int, int, str]], set[str]]:
    """Run the reference scheduler; return (visit_log, seen_set).

    visit_log rows are (round, seq, url) with seq the 0-based position in
    the round's deterministic processing order.
    """
    table: set[str] = set()
    for s in seeds:
        c = canonicalize(s)
        if c:
            table.add(c)
    visits: list[tuple[int, int, str]] = []
    for r in range(1, rounds + 1):
        cursor = ""
        seq = 0
        while True:
            chunk = sorted(u for u in table if u > cursor)[:chunk_size]
            if not chunk:
                break
            for g0 in range(0, len(chunk), group_size):
                group = chunk[g0 : g0 + group_size]
                discovered: list[str] = []
                for u in group:  # parallel in the reference; barrier after
                    visits.append((r, seq, u))
                    seq += 1
                    for link in links_of(u):
                        c = canonicalize(link)
                        if c and c != u:  # F1 self-link filter
                            discovered.append(c)
                # AddUninitializedNodes: INSERT IGNORE (dedup on PK)
                table.update(discovered)
            cursor = chunk[-1]
    return visits, table
