// Parity harness: drives the UNMODIFIED reference implementation
// (compiled from /root/reference — referenced by path, never copied)
// over a CSV of doubles and dumps the resulting sketch state so
// tools/parity/parity_check.py can compare our engine bit-for-bit,
// including the gamma^2 / last / first collapse paths.
//
// Usage: parity_main <csv> <bin_limit> <alpha> <mode 1|2|3> [<csv2>]
// With csv2: builds a second sketch and merges (reference merge path).
// Output: one line "n=<n> size=<size> alpha=<repr> gamma=<repr>",
// then "bin <key> <count>" per bin, then "q <q> <estimate>" per quantile.
#include <cstdio>
#include <cstdlib>
#include <vector>
#include "../../../reference/ddsketch.h"

static std::vector<double> load(const char *path) {
    std::vector<double> v;
    FILE *f = fopen(path, "r");
    if (!f) { fprintf(stderr, "cannot open %s\n", path); exit(2); }
    double x;
    while (fscanf(f, "%lf", &x) == 1) v.push_back(x);
    fclose(f);
    return v;
}

static void add_all(DDS_type *dds, const std::vector<double> &v, int mode) {
    for (double x : v) {
        if (mode == 1) DDS_AddCollapse(dds, x);
        else if (mode == 2) DDS_AddCollapseLastBucket(dds, x);
        else DDS_AddCollapseFirstBucket(dds, x);
    }
}

int main(int argc, char **argv) {
    if (argc < 5) { fprintf(stderr, "args: csv bin_limit alpha mode [csv2]\n"); return 2; }
    int bin_limit = atoi(argv[2]);
    double alpha = atof(argv[3]);
    int mode = atoi(argv[4]);
    DDS_type *dds = DDS_Init(1073741824, bin_limit, alpha);
    add_all(dds, load(argv[1]), mode);
    if (argc > 5) {
        DDS_type *dds2 = DDS_Init(1073741824, bin_limit, alpha);
        add_all(dds2, load(argv[5]), mode);
        if (mode == 1) DDS_MergeCollapse(dds, dds2);
        else if (mode == 2) DDS_MergeCollapseLastBucket(dds, dds2);
        else DDS_MergeCollapseFirstBucket(dds, dds2);
    }
    int size; DDS_Size(dds, size);
    printf("n=%d size=%d alpha=%.17g gamma=%.17g\n", dds->n, size, dds->alpha, dds->gamma);
    for (auto &kv : *(dds->bins)) printf("bin %d %d\n", kv.first, kv.second);
    double qs[] = {0.01,0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9,0.99};
    for (double q : qs) {
        double est; DDS_GetQuantile(dds, (float)q, est);
        printf("q %.2f %.17g\n", q, est);
    }
    return 0;
}
