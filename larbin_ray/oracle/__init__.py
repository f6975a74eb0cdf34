"""Pure-Python (no Ray) reference crawler replaying the Larbin queue
disciplines in simulated time — the correctness oracle the distributed
engine must match exactly."""
