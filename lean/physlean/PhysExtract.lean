import PhysLean
