"""Python ports of the reference's two example plugins, for the parity
layer. Same contract as the Go originals: F_map appends alternating
key/value strings to `out`; F_reduce sees the whole sorted partition.

word_count  <- example_plugins/word_count/word_count.go:1-46
log_analyzer <- example_plugins/log_analyzer/log_analyzer.go:1-136

Deviations (documented, deliberate):
- top-k ties in log_analyzer_reduce break by key ascending; the Go
  original's argmax order is Go-map-iteration order, i.e. nondeterministic
  (SURVEY.md §7.5 #3), so *some* deterministic rule is required for tests.
- output strings carry no trailing newline (Sprintln artifact of the
  text-line transport; our transport is columns).
"""

from __future__ import annotations

import re

from .job import PerKeyIntSumFormat

WORD_COUNT_R = 26  # word_count.go:10
LOG_ANALYZER_R = 10  # log_analyzer.go:9

_STRIP = re.compile(r"[^a-zA-Z0-9]+")


def word_count_map(file_name: str, line_number: int, line_text: str, out: list) -> None:
    # word_count.go:12-22 — lowercase, Fields-split, strip, emit (token, 1)
    # for EVERY token including ones that strip to '' (no filter there).
    for t in line_text.lower().split():
        out.append(_STRIP.sub("", t))
        out.append("1")


def word_count_reduce(keys: list[str], values: list[str], out: list) -> None:
    # word_count.go:26-44 — per-key sum with skip-on-atoi-error, then
    # '%-12s :: %4d' formatting.
    tally: dict[str, int] = {}
    for k, v in zip(keys, values):
        try:
            iv = int(v)
        except ValueError:
            continue
        tally[k] = tally.get(k, 0) + iv
    for k in sorted(tally):  # Go map order is nondeterministic; sort for tests
        out.append("%-12s :: %4d" % (k, tally[k]))


# word_count_reduce is exactly a per-key integer sum + printf — declare the
# lowering so MapReduceJob can run it as native groupBy.agg (keys are
# ASCII-only after _STRIP, so Python sorted() == Spark binary string order)
word_count_reduce.lowering = PerKeyIntSumFormat("%-12s :: %4d")


def log_analyzer_map(file_name: str, line_number: int, line_text: str, out: list) -> None:
    # log_analyzer.go:11-57 — extract crawler/url, normalize, emit
    # composite "crawler domain [path]" key with value 1.
    tokens = line_text.split()
    if len(tokens) < 4:
        return
    crawler = tokens[2]
    domain = tokens[3]
    if domain.startswith("http://"):
        domain = domain[7:]
    elif domain.startswith("https://"):
        domain = domain[8:]
    url = ""
    n = domain.find("/")
    if n > 0:
        url = domain[n + 1 :]
        domain = domain[:n]
    if not domain:
        return
    if domain[0] < "0" or domain[0] > "9":
        if domain.count(".") > 1:
            domain = domain[domain.index(".") + 1 :]
    else:
        n = domain.rfind(":")
        if n > 0:
            domain = domain[:n]
    if url:
        m = min(
            (i for i in (url.find("#"), url.find("?")) if i > 0), default=-1
        )
        if m > 0:
            url = url[:m]
        out.append(f"{crawler} {domain} {url}")
    else:
        out.append(f"{crawler} {domain}")
    out.append("1")


def log_analyzer_reduce(keys: list[str], values: list[str], out: list) -> None:
    # log_analyzer.go:58-135 — one pass feeding three tallies, then
    # summary lines + per-PARTITION top-10 domains / top-5 crawlers
    # (partition-wide, not global — SURVEY.md §7.5 #1).
    crawler_map: dict[str, int] = {}
    domain_map: dict[str, int] = {}
    url_map: dict[str, int] = {}
    for k, v in zip(keys, values):
        ks = k.split()
        try:
            iv = int(v)
        except ValueError:
            continue
        crawler_map[ks[0]] = crawler_map.get(ks[0], 0) + iv
        domain_map[ks[1]] = domain_map.get(ks[1], 0) + iv
        if len(ks) > 2:
            url_map[ks[1] + ks[2]] = url_map.get(ks[1] + ks[2], 0) + iv

    out.append("* Unique URLs:    %d" % (len(url_map) + len(domain_map)))
    out.append("* Unique Domains: %d" % len(domain_map))

    def top(m: dict[str, int], n: int) -> list[str]:
        return [k for k, _ in sorted(m.items(), key=lambda kv: (-kv[1], kv[0]))[:n]]

    top_dms = top(domain_map, min(10, len(domain_map)))
    top_crs = top(crawler_map, min(5, len(crawler_map)))
    if top_dms:
        out.append("* Top %d Websites:" % len(top_dms))
        out.extend("    - %s" % d for d in top_dms)
    if top_crs:
        out.append("* Top %d Crawlers:" % len(top_crs))
        out.extend("    - %s" % c for c in top_crs)
