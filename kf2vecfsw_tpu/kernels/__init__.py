from .histogram import count_canonical_device, histogram_pallas
