"""Newick parse/store (port of /root/reference/src/tree/NewickParser.cpp).

Branch lengths are parsed but ignored; stored trees emit 1.0 for every
branch, byte-identical to the reference output.
"""


def parse_newick(description, seq_ids, guide_tree_size):
    """seq_ids: list of sequence id strings (with or without '>').

    Returns tree_structure as list of (first, second) of length
    2*n_seqs-1 (leaves first)."""
    if len(description) == 0:
        raise RuntimeError("Error while parsing Newick tree: empty description.")

    n_seqs = len(seq_ids)
    name2id = {}
    for i, sid in enumerate(seq_ids):
        name = sid[1:] if sid.startswith('>') else sid
        name2id[name] = i

    guide_tree = [[-1, -1] for _ in range(2 * n_seqs)]
    cur_pos = len(guide_tree) - 1
    free_pos = cur_pos - 1
    second_branch = False
    prevs = [-1] * (len(guide_tree) + 1)

    p = 0
    end = len(description)
    while p < end:
        c = description[p]
        if c == '(':
            guide_tree[cur_pos][1 if second_branch else 0] = free_pos
            prevs[free_pos] = cur_pos
            cur_pos = free_pos
            p += 1
            free_pos -= 1
            second_branch = False
        elif c == ',':
            p += 1
            second_branch = True
        elif c == ')':
            p += 1
            cur_pos = prevs[cur_pos]
        elif c == ':':
            p += 1
            start = p
            while p < end and (description[p].isdigit() or description[p] in '.eE+-'):
                p += 1
            if p == start:
                pass
        elif c.isspace():
            p += 1
        else:
            name_end = p
            while name_end < end and description[name_end] not in ')(,:':
                name_end += 1
            name = description[p:name_end]
            sid = name2id.get(name, 0)
            guide_tree[cur_pos][1 if second_branch else 0] = sid
            p = name_end

    guide_tree.pop()
    return [tuple(x) for x in guide_tree]


def store_newick(guide_tree, seq_ids):
    """Returns the Newick string (NewickParser.cpp:103-165)."""
    n_seqs = len(seq_ids)
    out = []
    prevs = [-1] * (len(guide_tree) + 1)
    num_visits = [0] * (len(guide_tree) + 1)
    last_pos = len(guide_tree) - 1
    cur_pos = last_pos

    while True:
        if cur_pos < n_seqs:
            sid = seq_ids[cur_pos]
            if sid.startswith('>'):
                sid = sid[1:]
            out.append(sid + ":1.0")
            cur_pos = prevs[cur_pos]
        else:
            nv = num_visits[cur_pos]
            if nv == 0:
                out.append('(')
                dest = guide_tree[cur_pos][0]
                num_visits[cur_pos] += 1
                prevs[dest] = cur_pos
                cur_pos = dest
            elif nv == 1:
                out.append(',')
                dest = guide_tree[cur_pos][1]
                num_visits[cur_pos] += 1
                prevs[dest] = cur_pos
                cur_pos = dest
            else:
                if cur_pos == last_pos:
                    out.append(');')
                    break
                out.append('):1.0')
                num_visits[cur_pos] += 1
                cur_pos = prevs[cur_pos]

    return ''.join(out)
