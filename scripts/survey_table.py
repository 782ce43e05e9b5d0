#!/usr/bin/env python3
"""Regenerate SURVEY.md §8.2's query→oracle→impl table from SparkEntry.scala.

Prints the markdown rows to stdout; paste (or redirect) into §8.2. Keeps the
table mechanically 1:1 with the registered queries so the doc cannot drift.
"""
import glob
import re

src = open('src/main/scala/graft/SparkEntry.scala').read()
qsec = src.split('def queries')[1].split('def oracleSql')[0]
osec = src.split('def oracleSql')[1]
qnames = re.findall(r'"([a-z0-9_]+)"\s*->', qsec)
onames = set(re.findall(r'"([a-z0-9_]+)"\s*->', osec))

targets = {}
for m in re.finditer(r'"([a-z0-9_]+)"\s*->\s*(.+)', qsec):
    name, rhs = m.group(1), m.group(2)
    mm = re.search(r'(\w+)\.(\w+)\(', rhs) or re.search(r'\((\w+)\.(\w+) _\)', rhs)
    targets[name] = (mm.group(1), mm.group(2)) if mm else None

defloc = {}
for f in glob.glob('src/main/scala/graft/**/*.scala', recursive=True):
    for i, line in enumerate(open(f), 1):
        dm = re.search(r'def (\w+)\(', line)
        if dm:
            defloc.setdefault(dm.group(1), []).append(
                (f.replace('src/main/scala/', ''), i))

for q in qnames:
    t = targets.get(q)
    loc = ''
    if t:
        cands = defloc.get(t[1], [])
        pref = [c for c in cands if 'queries/' in c[0]] or cands
        if pref:
            loc = f'{pref[0][0]}:{pref[0][1]}'
    orc = 'oracle' if q in onames else 'rows/spec'
    print(f'| `{q}` | {orc} | `{loc}` |')
