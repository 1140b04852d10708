"""World state and orchestration: the structure-of-arrays map store, the
keyframe decision policy, and the frame-pipeline driver."""
