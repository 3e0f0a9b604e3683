from .connected import connected_components_np, connected_labels
from .stages import ClusteredTargets, cluster_stage1, cluster_stage2
