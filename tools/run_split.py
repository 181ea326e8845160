#!/usr/bin/env python3
"""Driver for split_pack: extract a named pack out of TrainQueries."""
import sys
import json
sys.path.insert(0, 'tools')
from split_pack import (SRC, extract_vals, extract_map_entries,
                        iter_code_chars)


def balance(text):
    d = {'(': 0, '{': 0, '[': 0}
    for i, c, in_code in iter_code_chars(text):
        if not in_code:
            continue
        if c == '(':
            d['('] += 1
        elif c == ')':
            d['('] -= 1
        elif c == '{':
            d['{'] += 1
        elif c == '}':
            d['{'] -= 1
        elif c == '[':
            d['['] += 1
        elif c == ']':
            d['['] -= 1
    return d


def run(vals, keys, header, out_path):
    lines = open(SRC).readlines()
    rem, out = extract_vals(lines, vals)
    for i, u in enumerate(out):
        b = balance(u)
        assert not any(v != 0 for v in b.values()), \
            f'unbalanced unit {i}: {b}\n{u.splitlines()[0]}'
    text = ''.join(rem)
    text, defs_moved, dk = extract_map_entries(
        text, 'val defs: Map[String, Q] = Map(', keys)
    text, base_moved, bk = extract_map_entries(
        text, 'private val baseOracle: Map[String, String] = Map(', keys)
    text, or_moved, ok = extract_map_entries(
        text, 'val oracle: Map[String, String] = baseOracle ++ Map(', keys)
    missing = set(keys) - dk
    assert not missing, f'defs not found: {missing}'
    no_oracle = set(keys) - bk - ok
    assert not no_oracle, f'oracle entries not found: {no_oracle}'
    b = balance(text)
    assert not any(v != 0 for v in b.values()), f'remainder unbalanced: {b}'

    defs = '  val defs: Map[String, Q] = Map(\n' + ',\n'.join(
        '    ' + e.strip() for e in defs_moved) + ')\n'
    if base_moved:
        base = ('  private val baseOracle: Map[String, String] = Map(\n' +
                ',\n'.join('    ' + e.strip() for e in base_moved) + ')\n')
        tail = ('  val oracle: Map[String, String] = baseOracle ++ Map(\n' +
                ',\n'.join('    ' + e.strip() for e in or_moved) + ')\n')
    else:
        base = ''
        tail = ('  val oracle: Map[String, String] = Map(\n' +
                ',\n'.join('    ' + e.strip() for e in or_moved) + ')\n')
    pack = (header + ''.join(out) + '\n' + defs + '\n' + base + '\n' +
            tail + '}\n')
    b = balance(pack)
    assert b['('] == 0 and b['['] == 0 and b['{'] == 0, f'pack unbalanced: {b}'
    open(out_path, 'w').write(pack)
    open(SRC, 'w').write(text)
    print(f'wrote {out_path}; moved {len(out)} units, '
          f'{len(defs_moved)} defs, {len(base_moved)}+{len(or_moved)} oracles')


if __name__ == '__main__':
    spec = json.load(open(sys.argv[1]))
    run(spec['vals'], set(spec['keys']), spec['header'], spec['out'])
