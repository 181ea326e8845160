#!/usr/bin/env python3
"""One-shot refactor helper: move query vals + defs entries + oracle
entries out of a queries pack into a new pack file. Developer-side tool
only. String-aware: paren/brace depth ignores content inside Scala
string literals (", \"\"\", 'c') and line comments."""
import re

SRC = 'src/main/scala/graft/queries/TrainQueries.scala'

member_re = re.compile(
    r'^  (?:private(?:\[\w+\])? )?(?:lazy )?(?:val|def|type)\s')


def iter_code_chars(text):
    """Yield (index, char, in_code) where in_code=False inside string
    literals and // comments."""
    i = 0
    n = len(text)
    while i < n:
        c = text[i]
        if text.startswith('"""', i):
            j = text.index('"""', i + 3)
            # handle trailing extra quotes ("""...."""")
            while j + 3 < n and text[j + 3] == '"':
                j += 1
            for k in range(i, j + 3):
                yield k, text[k], False
            i = j + 3
        elif c == '"':
            j = i + 1
            while j < n:
                if text[j] == '\\':
                    j += 2
                elif text[j] == '"':
                    break
                else:
                    j += 1
            for k in range(i, j + 1):
                yield k, text[k], False
            i = j + 1
        elif c == "'" and i + 2 < n and (text[i + 2] == "'" or
                (text[i + 1] == '\\' and i + 3 < n and text[i + 3] == "'")):
            j = i + 2 if text[i + 2] == "'" else i + 3
            for k in range(i, j + 1):
                yield k, text[k], False
            i = j + 1
        elif text.startswith('//', i):
            j = text.find('\n', i)
            if j < 0:
                j = n - 1
            for k in range(i, j + 1):
                yield k, text[k], False
            i = j + 1
        elif text.startswith('/*', i):
            j = text.index('*/', i + 2)
            for k in range(i, j + 2):
                yield k, text[k], False
            i = j + 2
        else:
            yield i, c, True
            i += 1


def parse_units(lines):
    starts = [i for i, l in enumerate(lines) if member_re.match(l)]
    units = []
    for idx, s in enumerate(starts):
        u = s
        j = s - 1
        while j >= 0:
            t = lines[j].rstrip()
            if t.endswith('*/'):
                k = j
                while k >= 0 and not lines[k].lstrip().startswith('/**'):
                    k -= 1
                u = k
                j = k - 1
            elif t.strip().startswith('//'):
                u = j
                j -= 1
            else:
                break
        if idx + 1 < len(starts):
            end = starts[idx + 1]
        else:
            # last member: stop before the object's closing brace line
            end = len(lines)
            while end > s and lines[end - 1].rstrip('\n') in ('}', ''):
                end -= 1
        units.append([u, s, end])
    for idx in range(len(units) - 1):
        units[idx][2] = units[idx + 1][0]
    return units


def extract_vals(lines, names, src=None):
    units = parse_units(lines)
    keep = [True] * len(lines)
    out = []
    found = set()
    for u, s, e in units:
        for nm in names:
            if re.search(r'\b(val|def)\s+' + re.escape(nm) + r'\b',
                         lines[s]):
                out.append(''.join(lines[u:e]))
                for i in range(u, e):
                    keep[i] = False
                found.add(nm)
                break
    missing = set(names) - found
    if missing:
        raise SystemExit(f'vals not found: {missing}')
    rem = [l for i, l in enumerate(lines) if keep[i]]
    return rem, out


def extract_map_entries(text, map_anchor, keys):
    start = text.index(map_anchor)
    open_idx = text.index('Map(', start) + 3  # index of '('
    # find matching close with string-aware depth
    sub = text[open_idx:]
    depth = 0
    close_rel = None
    boundaries = []  # top-level comma positions (relative to open_idx)
    for i, c, in_code in iter_code_chars(sub):
        if not in_code:
            continue
        if c in '({[':
            depth += 1
        elif c in ')}]':
            depth -= 1
            if depth == 0:
                close_rel = i
                break
        elif c == ',' and depth == 1:
            boundaries.append(i)
    assert close_rel is not None
    body_start = open_idx + 1
    body_end = open_idx + close_rel
    body = text[body_start:body_end]
    cuts = [b - 1 for b in boundaries]  # relative to body start
    entries = []
    prev = 0
    for b in boundaries:
        entries.append(body[prev:b - 1])
        prev = b - 1 + 1
    entries.append(body[prev:])
    kept, moved = [], []
    for e in entries:
        m = re.search(r'"(op[a-z0-9_]+)"\s*->', e)
        if m and m.group(1) in keys:
            moved.append(e)
        else:
            kept.append(e)
    moved_keys = set()
    for e in moved:
        moved_keys.add(re.search(r'"(op[a-z0-9_]+)"', e).group(1))
    new_body = ','.join(kept)
    new_text = text[:body_start] + new_body + text[body_end:]
    return new_text, moved, moved_keys


if __name__ == '__main__':
    print('library module; drive from a caller script')
