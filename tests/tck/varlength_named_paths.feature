Feature: VarLengthNamedPaths

  # Var-length named paths (round 7, BEYOND reference parity — the
  # reference supports no path values at all): p = (a)-[*lo..hi]->(b)
  # binds p over the expansion's runtime node/rel/direction arrays.
  # length(p) is size of the rel list; nodes(p)/relationships(p) and the
  # full path value render by joining the id arrays against the scans.

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'a'})-[:T {w: 1}]->(b:P {name: 'b'})-[:T {w: 2}]->(c:P {name: 'c'})-[:T {w: 3}]->(d:P {name: 'd'}),
             (:P {name: 'lonely'})
      """

  Scenario: length of a var-length named path
    When executing query:
      """
      MATCH p = (a:P {name: 'a'})-[*1..3]->(b)
      RETURN b.name AS n, length(p) AS l
      """
    Then the result should be, in any order:
      | n   | l |
      | 'b' | 1 |
      | 'c' | 2 |
      | 'd' | 3 |
    And no side effects

  Scenario: length of an unbounded var-length named path
    When executing query:
      """
      MATCH p = (a:P {name: 'a'})-[*2..]->(b)
      RETURN b.name AS n, length(p) AS l
      """
    Then the result should be, in any order:
      | n   | l |
      | 'c' | 2 |
      | 'd' | 3 |
    And no side effects

  Scenario: nodes of a var-length named path in traversal order
    When executing query:
      """
      MATCH p = (a:P {name: 'a'})-[*2..2]->(b)
      RETURN [x IN nodes(p) | x.name] AS names
      """
    Then the result should be, in any order:
      | names           |
      | ['a', 'b', 'c'] |
    And no side effects

  Scenario: relationships of a var-length named path carry properties and types
    When executing query:
      """
      MATCH p = (a:P {name: 'a'})-[*2..2]->(b)
      RETURN [r IN relationships(p) | r.w] AS ws,
             [r IN relationships(p) | type(r)] AS ts
      """
    Then the result should be, in any order:
      | ws     | ts         |
      | [1, 2] | ['T', 'T'] |
    And no side effects

  Scenario: zero-length named path binds a single node and an empty rel list
    When executing query:
      """
      MATCH p = (a:P {name: 'a'})-[*0..1]->(b)
      RETURN length(p) AS l, [x IN nodes(p) | x.name] AS names
      """
    Then the result should be, in any order:
      | l | names      |
      | 0 | ['a']      |
      | 1 | ['a', 'b'] |
    And no side effects

  Scenario: OPTIONAL unmatched var-length path is null everywhere
    When executing query:
      """
      MATCH (a:P {name: 'lonely'})
      OPTIONAL MATCH p = (a)-[*]->(b)
      RETURN length(p) AS l, nodes(p) AS ns, relationships(p) AS rs
      """
    Then the result should be, in any order:
      | l    | ns   | rs   |
      | null | null | null |
    And no side effects

  Scenario: WHERE and ORDER BY over the path length
    When executing query:
      """
      MATCH p = (a:P {name: 'a'})-[*]->(b)
      WHERE length(p) >= 2
      RETURN b.name AS n ORDER BY length(p) DESC
      """
    Then the result should be, in order:
      | n   |
      | 'd' |
      | 'c' |
    And no side effects

  Scenario: Aggregate over var-length path lengths
    When executing query:
      """
      MATCH p = (a:P)-[*]->(b)
      RETURN length(p) AS l, count(*) AS c
      """
    Then the result should be, in any order:
      | l | c |
      | 1 | 3 |
      | 2 | 2 |
      | 3 | 1 |
    And no side effects

  Scenario: reduce over the nodes of a var-length path
    When executing query:
      """
      MATCH p = (a:P {name: 'a'})-[*3..3]->(d)
      RETURN reduce(s = '', x IN nodes(p) | s + x.name) AS joined
      """
    Then the result should be, in any order:
      | joined |
      | 'abcd' |
    And no side effects

  Scenario: A named path mixing fixed and var-length hops is rejected
    When executing query:
      """
      MATCH p = (a:P)-[:T]->()-[:T*1..2]->(b) RETURN p
      """
    Then a SyntaxError should be raised at compile time: *
