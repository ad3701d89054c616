"""User MR plugin: distributed grep — emit every line matching a fixed
pattern, tagged with its file and line number.

The canonical "selective map, identity-ish reduce" MapReduce demo
(alongside wordcount and inverted index), written against the same
plugin contract the reference compiles from user Go source
(cn/mr_actions.go:87-199; exports R / f_map / f_reduce exactly like
example_plugins/word_count/word_count.go). Unlike the dense jobs, the
mapper emits NOTHING for most lines — the shape that exercises F2
source pruning plus empty mapper outputs end-to-end. Run it straight
from this file:

    python -m go_dfs_mapreduce_spark mr examples/dist_grep.py \
        logs.txt -o /tmp/out
    python -m go_dfs_mapreduce_spark mr examples/dist_grep.py \
        -o /tmp/out --dfs-nodes node1,node2   # reference chunk dirs

f_map emits (match-key, "file:line:text") for matching lines only;
f_reduce orders each key's hits by (file, line) and prints one
'file:line: text' line per hit, grouped under the matched key. Edit
PATTERN for your search; it is a plain compiled regex.
"""

import re

R = 8

PATTERN = re.compile(r"error|fail|panic", re.IGNORECASE)


def f_map(file_name, line_number, line_text, out):
    m = PATTERN.search(line_text)
    if m:
        out.append(m.group(0).lower())
        out.append(f"{file_name}:{line_number}:{line_text}")


def f_reduce(keys, values, out):
    hits = {}
    for k, v in zip(keys, values):
        hits.setdefault(k, []).append(v)

    def _file_line(p):
        f, _, rest = p.partition(":")
        n, _, _ = rest.partition(":")
        return (f, int(n))

    for k in sorted(hits):
        out.append(f"== {k} ==")
        for h in sorted(set(hits[k]), key=_file_line):
            f, _, rest = h.partition(":")
            n, _, text = rest.partition(":")
            out.append(f"{f}:{n}: {text}")
