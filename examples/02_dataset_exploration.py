"""Dataset + partition exploration (the reference's notebook 02).

Prints dataset stats and heterogeneity metrics for IID vs Dirichlet
partitions, and writes partition heatmaps.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multimodal_fl_security_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

from multimodal_fl_security_tpu.data.datasets import load_dataset
from multimodal_fl_security_tpu.data.partition import partition_data
from multimodal_fl_security_tpu.experiments.eda import (
    dataset_stats,
    heterogeneity_metrics,
    plot_partition_heatmap,
)


def main():
    ds = load_dataset("synthetic", "train", num_train=4000)
    print("stats:", dataset_stats(ds))
    for strategy, alpha in (("iid", None), ("dirichlet", 0.5),
                            ("dirichlet", 0.1), ("shard", None)):
        parts = partition_data(ds.labels, 10, strategy, alpha=alpha or 0.5)
        het = heterogeneity_metrics(ds.labels, parts, ds.num_classes)
        tag = strategy if alpha is None else f"{strategy}(alpha={alpha})"
        print(f"{tag:22s} mean_emd={het['mean_emd']:.3f} "
              f"coverage={het['mean_coverage']:.3f}")
        png = plot_partition_heatmap(ds.labels, parts, ds.num_classes,
                                     f"partition_{strategy}_{alpha}.png")
        print("  wrote", png)


if __name__ == "__main__":
    main()
