"""User MR plugin: inverted index — word -> sorted list of the files
(with line numbers) it appears on.

The classic second MapReduce demo after wordcount, written against the
same plugin contract the reference compiles from user Go source
(cn/mr_actions.go:87-199; exports R / f_map / f_reduce exactly like
example_plugins/word_count/word_count.go). Run it straight from this
file:

    python -m go_dfs_mapreduce_spark mr examples/inverted_index.py \
        corpus.txt -o /tmp/out
    python -m go_dfs_mapreduce_spark mr examples/inverted_index.py \
        -o /tmp/out --dfs-nodes node1,node2   # reference chunk dirs

f_map emits (token, "file:line") per occurrence; f_reduce groups each
token's postings, dedupes, sorts, and prints one 'token -> p1 p2 ...'
line per token. R=26 pairs with the parity partitioner so each
reducer's output is the alphabetic block the reference's Q13 ordering
produces.
"""

import re

R = 26

_STRIP = re.compile(r"[^a-zA-Z0-9]+")


def f_map(file_name, line_number, line_text, out):
    for t in line_text.lower().split():
        w = _STRIP.sub("", t)
        if w:
            out.append(w)
            out.append(f"{file_name}:{line_number}")


def f_reduce(keys, values, out):
    postings = {}
    for k, v in zip(keys, values):
        postings.setdefault(k, set()).add(v)

    def _file_line(p):
        f, _, n = p.rpartition(":")
        return (f, int(n))  # numeric line order ('x:2' before 'x:10')

    for k in sorted(postings):
        ordered = sorted(postings[k], key=_file_line)
        out.append(f"{k} -> {' '.join(ordered)}")
