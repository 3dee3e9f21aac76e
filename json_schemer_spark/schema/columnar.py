"""Columnar lowering (keyword -> Column expressions). Round-1 WIP."""
def lowerable(schema, dialect):
    return False
def validate_json_column_lowered(df, col, schema, dialect):
    raise NotImplementedError
