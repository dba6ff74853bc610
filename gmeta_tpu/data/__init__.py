from gmeta_tpu.data.graph import CSRGraph, GraphStore  # noqa: F401
from gmeta_tpu.data.sampler import EpisodeSampler  # noqa: F401
from gmeta_tpu.data.extract import SubgraphExtractor  # noqa: F401
from gmeta_tpu.data.pack import SubgraphSet, TaskBatch, pack_task, stack_tasks  # noqa: F401
