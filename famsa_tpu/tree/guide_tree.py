"""Guide tree container (port of /root/reference/src/tree/GuideTree.cpp)."""

from .newick import parse_newick, store_newick


class GuideTree:
    def __init__(self):
        self.tree = []       # list of (first, second); leaves 0..n-1 first

    def raw(self):
        return self.tree

    def init_leaves(self, n):
        """AbstractTreeGenerator::operator() clears the tree and adds n leaf
        slots before run() (AbstractTreeGenerator.cpp:25-32)."""
        self.tree = [(-1, -1)] * n

    def get_sequence_count(self):
        return (len(self.tree) + 1) // 2 if self.tree else 0

    # ------------------------------------------------------------------
    def load_newick(self, file_name, seq_ids):
        with open(file_name) as f:
            description = f.read()
        description = description.replace('\r', '').replace('\n', '')
        self.tree = parse_newick(description, seq_ids, None)

    def save_newick(self, file_name, seq_ids):
        with open(file_name, 'w') as f:
            f.write(store_newick(self.tree, seq_ids))

    # ------------------------------------------------------------------
    def calculate_sackin_index(self):
        n = self.get_sequence_count()
        if not n:
            return 0
        depths = [0] * len(self.tree)
        for i in range(len(self.tree) - 1, n - 1, -1):
            a, b = self.tree[i]
            depths[a] = depths[i] + 1
            depths[b] = depths[i] + 1
        return sum(depths[i] + 1 for i in range(n))

    # ------------------------------------------------------------------
    def to_unique(self, original2unique, n_uniques):
        """Rewrite an imported full-sequence-space tree into dedup space
        (GuideTree.cpp:91-143)."""
        vt = [list(x) for x in self.tree]
        n_total = len(original2unique)
        offset = n_total - n_uniques

        del vt[n_uniques:n_total]

        out_ids = list(range(n_uniques)) + [0] * (len(vt) - n_uniques)
        n_dups = 0

        def is_dup(node_id):
            return out_ids[node_id] < n_uniques

        for i in range(n_uniques, len(vt)):
            node = vt[i]
            node[0] = original2unique[node[0]] if node[0] < n_total else node[0] - offset
            node[1] = original2unique[node[1]] if node[1] < n_total else node[1] - offset

            if node[0] == node[1]:
                n_dups += 1
                out_ids[i] = node[1]
            elif is_dup(node[0]) and node[1] == out_ids[node[0]]:
                n_dups += 1
                out_ids[i] = node[1]
            elif is_dup(node[1]) and node[0] == out_ids[node[1]]:
                n_dups += 1
                out_ids[i] = node[0]
            else:
                node[0] = out_ids[node[0]]
                node[1] = out_ids[node[1]]
                out_ids[i] = i - n_dups

        for i in range(n_uniques, len(vt)):
            if not is_dup(i):
                vt[out_ids[i]] = vt[i]

        del vt[len(vt) - n_dups:]
        self.tree = [tuple(x) for x in vt]

    def from_unique(self, original2unique):
        """Expand a dedup-space tree back to full sequence space
        (GuideTree.cpp:146-208)."""
        n_total = len(original2unique)
        n_uniques = self.get_sequence_count()
        n_dups = n_total - n_uniques
        vt = [list(x) for x in self.tree]

        unique2original = [[] for _ in range(n_uniques)]
        out_ids = list(range(n_uniques))
        for i in range(n_total):
            unique2original[original2unique[i]].append(i)

        vt[n_uniques:n_uniques] = [[-1, -1] for _ in range(2 * n_dups)]

        node_id = n_uniques + n_dups
        for iu in range(n_uniques):
            occs = unique2original[iu]
            for i in range(1, len(occs)):
                if i == 1:
                    vt[node_id] = [occs[0], occs[1]]
                else:
                    vt[node_id] = [occs[i], node_id - 1]
                node_id += 1
            if len(occs) > 1:
                out_ids[iu] = node_id - 1
            else:
                out_ids[iu] = occs[0]

        for i in range(node_id, len(vt)):
            node = vt[i]
            node[0] = out_ids[node[0]] if node[0] < n_uniques else node[0] + 2 * n_dups
            node[1] = out_ids[node[1]] if node[1] < n_uniques else node[1] + 2 * n_dups

        self.tree = [tuple(x) for x in vt]
