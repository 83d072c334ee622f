"""TPU kernel layer: window-based samplers and Pallas fused hot loops."""
