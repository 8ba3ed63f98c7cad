#!/usr/bin/env python3
"""Extract SQL statements from the reference's Rust test suite (r#"…"#
string literals starting with a SQL keyword) into the delimited file
graft.TestSweep reads (SOH-separated file/sql pairs, STX-terminated)."""
import re, os, sys

out = sys.argv[1] if len(sys.argv) > 1 else '/tmp/ref_test_sqls.txt'
pat = re.compile(r'r#"(.*?)"#', re.S)
keywords = ('SELECT', 'CREATE', 'SHOW', 'INSERT', 'UPDATE', 'DELETE', 'START',
            'STOP', 'PAUSE', 'RESUME', 'DEPLOY', 'ROLLBACK', 'WITH', 'DESCRIBE', 'LIST')
seen = {}
for dirpath, _, files in os.walk('/root/reference/tests'):
    for f in files:
        if not f.endswith('.rs'):
            continue
        p = os.path.join(dirpath, f)
        text = open(p, encoding='utf-8', errors='replace').read()
        for m in pat.finditer(text):
            s = m.group(1).strip()
            head = s.lstrip().split(None, 1)
            if head and head[0].upper() in keywords:
                key = ' '.join(s.split())
                seen.setdefault(key, (p.replace('/root/reference/', ''), s))
with open(out, 'w') as fh:
    for path, sql in seen.values():
        fh.write(path + chr(1) + sql.replace(chr(1), ' ') + chr(2))
print(f"{len(seen)} unique statements -> {out}")
