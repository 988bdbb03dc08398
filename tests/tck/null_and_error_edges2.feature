Feature: NullAndErrorEdges2

  # Round-7 corpus growth, part 2: entity functions over null/unmatched
  # entities, UNWIND null/empty, DISTINCT and ORDER BY with nulls,
  # numeric edge identities, toString, temporal constructors on null.

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (a:N {name: 'a', v: 1})-[:R]->(b:N {name: 'b'})
      """

  Scenario: Entity functions of a literal null are null
    When executing query:
      """
      RETURN labels(null) AS l, type(null) AS t, id(null) AS i,
             keys(null) AS k, properties(null) AS p
      """
    Then the result should be, in any order:
      | l    | t    | i    | k    | p    |
      | null | null | null | null | null |
    And no side effects

  Scenario: Entity functions of an unmatched OPTIONAL entity are null
    When executing query:
      """
      MATCH (n:N {name: 'a'}) OPTIONAL MATCH (n)-[r:NOPE]->(m)
      RETURN labels(m) AS lb, type(r) AS ty, id(m) AS i,
             properties(m) AS pr, keys(m) AS ks
      """
    Then the result should be, in any order:
      | lb   | ty   | i    | pr   | ks   |
      | null | null | null | null | null |
    And no side effects

  Scenario: Property access on an unmatched OPTIONAL entity is null
    When executing query:
      """
      MATCH (n:N {name: 'a'}) OPTIONAL MATCH (n)-[:NOPE]->(m)
      RETURN m.name AS nm, m.name IS NULL AS is_null
      """
    Then the result should be, in any order:
      | nm   | is_null |
      | null | true    |
    And no side effects

  Scenario: keys and properties of a matched entity skip null-valued properties in keys only
    When executing query:
      """
      MATCH (n:N {name: 'b'})
      RETURN keys(n) AS ks, properties(n) AS pr
      """
    Then the result should be, in any order:
      | ks       | pr                       |
      | ['name'] | {name: 'b', v: null}     |
    And no side effects

  Scenario: UNWIND of null and of an empty list produce no rows
    When executing query:
      """
      UNWIND [0] AS outer
      UNWIND null AS x
      RETURN x
      """
    Then the result should be, in any order:
      | x |
    And no side effects

  Scenario: UNWIND keeps null elements of a non-empty list
    When executing query:
      """
      UNWIND [1, null, 2] AS x RETURN x
      """
    Then the result should be, in any order:
      | x    |
      | 1    |
      | null |
      | 2    |
    And no side effects

  Scenario: DISTINCT treats nulls as one group
    When executing query:
      """
      UNWIND [1, null, null, 1] AS x RETURN DISTINCT x AS v
      """
    Then the result should be, in any order:
      | v    |
      | 1    |
      | null |
    And no side effects

  Scenario: count DISTINCT ignores nulls
    When executing query:
      """
      UNWIND [1, null, null, 1, 2] AS x
      RETURN count(DISTINCT x) AS c, count(x) AS all_non_null, count(*) AS rows
      """
    Then the result should be, in any order:
      | c | all_non_null | rows |
      | 2 | 3            | 5    |
    And no side effects

  Scenario: ORDER BY sorts null greatest ascending and first descending
    When executing query:
      """
      UNWIND [3, null, 1] AS x
      RETURN x ORDER BY x
      """
    Then the result should be, in order:
      | x    |
      | 1    |
      | 3    |
      | null |
    And no side effects

  Scenario: ORDER BY DESC puts null first
    When executing query:
      """
      UNWIND [3, null, 1] AS x
      RETURN x ORDER BY x DESC
      """
    Then the result should be, in order:
      | x    |
      | null |
      | 3    |
      | 1    |
    And no side effects

  Scenario: WHERE eliminates rows whose predicate is null
    When executing query:
      """
      UNWIND [1, null, 2] AS x
      WITH x WHERE x > 1
      RETURN x
      """
    Then the result should be, in any order:
      | x |
      | 2 |
    And no side effects

  Scenario: Numeric edge identities
    When executing query:
      """
      RETURN 0 ^ 0 AS a, abs(null) AS b, sign(null) AS c, sign(-3) AS d,
             sign(0) AS e
      """
    Then the result should be, in any order:
      | a   | b    | c    | d  | e |
      | 1.0 | null | null | -1 | 0 |
    And no side effects

  Scenario: toString of null is null, of values is canonical
    When executing query:
      """
      RETURN toString(null) AS a, toString(1.5) AS b, toString(true) AS c,
             toString(7) AS d
      """
    Then the result should be, in any order:
      | a    | b     | c      | d   |
      | null | '1.5' | 'true' | '7' |
    And no side effects

  Scenario: Temporal constructors of null are null
    When executing query:
      """
      RETURN date(null) AS d, duration(null) AS dur
      """
    Then the result should be, in any order:
      | d    | dur  |
      | null | null |
    And no side effects

  Scenario: Temporal accessor on a null temporal is null
    When executing query:
      """
      WITH date('2020-01-15') AS d
      RETURN d.year AS y, date(null).year AS ny
      """
    Then the result should be, in any order:
      | y    | ny   |
      | 2020 | null |
    And no side effects
