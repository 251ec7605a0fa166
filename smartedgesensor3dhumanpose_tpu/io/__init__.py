"""Host-side ingestion: synthetic scene generation, JSONL/NPZ replay, and
message packing (the transport-free equivalent of the reference's ROS topic
layer + bag replay)."""
