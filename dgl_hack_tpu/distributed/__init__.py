from .prefetch import ThreadedPrefetcher, prefetch_to_device  # noqa: F401
from .bootstrap import initialize_from_env, read_ip_config  # noqa: F401
from .feature_store import (  # noqa: F401
    FeatureStore, attach_shared_graph, save_shared_graph,
)
from .kvstore import (  # noqa: F401
    KVServer, KVClient, NativeTransport, LoopbackTransport, make_transports,
)
from .dis_sampler import (  # noqa: F401
    SamplerSender, SamplerReceiver, SamplerPool,
    serialize_sample, deserialize_sample,
)
