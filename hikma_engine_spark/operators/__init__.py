# operator modules are imported directly (no eager re-export — some
# operators are not yet present in round 1 and eager imports create
# import-order hazards)
