"""Dataset readers (Y4M video frames, image pipelines in util.datasets)."""

from compression_tpu.datasets.y4m import Y4MDataset, y4m_frames
