#!/usr/bin/env python3
"""One-shot refactor helper: move query vals + defs entries + oracle
entries out of TrainQueries.scala into a new pack file. Developer-side
tool only."""
import re
import sys

SRC = 'src/main/scala/graft/queries/TrainQueries.scala'

member_re = re.compile(
    r'^  (?:private(?:\[\w+\])? )?(?:lazy )?(?:val|def|type)\s')


def parse_units(lines):
    """Return list of (start, end) line-index ranges, one per top-level
    member, where start includes the contiguous doc comment above."""
    starts = [i for i, l in enumerate(lines) if member_re.match(l)]
    units = []
    for idx, s in enumerate(starts):
        # walk back over a contiguous doc/line-comment block
        u = s
        j = s - 1
        # skip blank line directly above? doc blocks are contiguous
        while j >= 0:
            t = lines[j].rstrip()
            if t.endswith('*/'):
                # walk to the matching /**
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
        end = starts[idx + 1] if idx + 1 < len(starts) else len(lines)
        # end: walk END back over the next unit's doc comment
        units.append([u, s, end])
    # fix ends: each unit ends where the next unit's START (incl. doc) begins
    for idx in range(len(units) - 1):
        units[idx][2] = units[idx + 1][0]
    return units


def extract_vals(lines, names):
    units = parse_units(lines)
    keep = [True] * len(lines)
    out = []
    found = set()
    for u, s, e in units:
        m = member_re.match(lines[s])
        for n in names:
            if re.search(r'\b' + re.escape(n) + r'\b\s*[:(=]', lines[s]) or \
               re.search(r'\b' + re.escape(n) + r'\b\s*$', lines[s].rstrip()):
                out.append(''.join(lines[u:e]))
                for i in range(u, e):
                    keep[i] = False
                found.add(n)
                break
    missing = set(names) - found
    if missing:
        raise SystemExit(f'vals not found: {missing}')
    rem = [l for i, l in enumerate(lines) if keep[i]]
    return rem, out


def extract_map_entries(text, map_anchor, keys):
    """Remove entries for `keys` from the map starting at map_anchor;
    return (new_text, extracted_entries_text)."""
    start = text.index(map_anchor)
    # find the matching closing paren of Map(
    i = text.index('Map(', start) + 4
    depth = 1
    while depth > 0:
        c = text[i]
        if c == '(':
            depth += 1
        elif c == ')':
            depth -= 1
        i += 1
    body_start = text.index('Map(', start) + 4
    body_end = i - 1
    body = text[body_start:body_end]
    # split body into entries at top-level commas
    entries = []
    depth = 0
    cur = []
    k = 0
    while k < len(body):
        c = body[k]
        if c in '({[':
            depth += 1
        elif c in ')}]':
            depth -= 1
        if c == ',' and depth == 0:
            entries.append(''.join(cur))
            cur = []
        else:
            cur.append(c)
        k += 1
    if ''.join(cur).strip():
        entries.append(''.join(cur))
    kept, moved = [], []
    for e in entries:
        m = re.search(r'"(op[a-z0-9_]+)"\s*->', e)
        if m and m.group(1) in keys:
            moved.append(e)
        else:
            kept.append(e)
    moved_keys = {re.search(r'"(op[a-z0-9_]+)"', e).group(1) for e in moved}
    new_body = ','.join(kept)
    new_text = text[:body_start] + new_body + text[body_end:]
    return new_text, moved, moved_keys


if __name__ == '__main__':
    print('library module; drive from a caller script')
